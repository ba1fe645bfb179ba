package graft

import graft.functions.GeoFunctions._
import graft.plans.DistanceJoinRewrite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** The crossJoin+distance-filter → grid equi join optimizer rule: results
  * must be identical to the naive plan, and the physical join must stop
  * being a cartesian/BNLJ once the rule fires.
  */
class DistanceJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def pts(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      (i.toLong, rnd.nextDouble() * 170 - 85, rnd.nextDouble() * 350 - 175))
  }

  private def naiveJoin(a: DataFrame, b: DataFrame): DataFrame =
    a.crossJoin(b)
      .filter(euclideanDeg($"lat_a", $"lon_a", $"lat_b", $"lon_b") < 12.0)
      .select($"id_a", $"id_b")

  test("rewrite preserves results exactly and kills the cartesian") {
    val a = pts(1, 400).toDF("id_a", "lat_a", "lon_a")
    val b = pts(2, 400).toDF("id_b", "lat_b", "lon_b")

    val expected = naiveJoin(a, b).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DistanceJoinRewrite
    try {
      val rewritten = naiveJoin(a, b)
      val got = rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected)
      val plan = rewritten.queryExecution.executedPlan match {
        case ad: AdaptiveSparkPlanExec => ad.executedPlan.toString
        case p => p.toString
      }
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq DistanceJoinRewrite)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    }
  }

  test("rule leaves broadcastable joins alone") {
    val a = pts(3, 50).toDF("id_a", "lat_a", "lon_a")
    val b = pts(4, 50).toDF("id_b", "lat_b", "lon_b")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DistanceJoinRewrite
    try {
      // default broadcast threshold: tiny sides stay BNLJ (better plan)
      val plan = naiveJoin(a, b).queryExecution.optimizedPlan.toString
      assert(!plan.contains("__cell"), plan)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq DistanceJoinRewrite)
    }
  }
}
