package graft

import graft.plans.{DistanceJoinRewrite, GraftSparkExtensions}
import org.apache.spark.sql.GraftExtensionsProbe

/** The PUBLIC integration point: a user session built with
  * spark.sql.extensions=GraftSparkExtensions must get every kernel
  * function and the distance-join rewrite rule. spark.sql.extensions is a
  * static conf (unavailable to a second session on a shared test
  * SparkContext), so this inspects what the class injects via the
  * registration API itself — the same calls session construction makes.
  */
class ExtensionsSpec extends SparkSpec {

  test("extension class injects all kernel functions and the rewrite rule") {
    val (functions, rules) =
      GraftExtensionsProbe.inspect(new GraftSparkExtensions, spark)
    val expected = Set("vec_dot", "shingle_hash_set", "minhash_sig",
      "simhash_sig", "sorted_intersect_size")
    assert(expected.subsetOf(functions.toSet),
      s"missing: ${expected -- functions.toSet}")
    assert(rules.exists(_ eq DistanceJoinRewrite), rules.toString)
  }
}
