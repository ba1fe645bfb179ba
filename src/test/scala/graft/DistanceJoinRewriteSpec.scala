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

  private def naiveJoin(a: DataFrame, b: DataFrame, r: Double = 12.0): DataFrame =
    a.crossJoin(b)
      .filter(euclideanDeg($"lat_a", $"lon_a", $"lat_b", $"lon_b") < r)
      .select($"id_a", $"id_b")

  private def withRule[T](body: => T): T = {
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DistanceJoinRewrite
    try body
    finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq DistanceJoinRewrite)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    }
  }

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

  test("adversarial: negative-coordinate flooring and exact cell boundaries preserved") {
    // floor(-24/12) = -2 but integer truncation gives -2 vs -1 for
    // -23.9999 — points ON multiples of r and epsilon either side, in the
    // negative quadrant, are exactly where a floor/truncate bug shows
    val r = 12.0
    val coords = Seq(-36.0, -24.0001, -24.0, -23.9999, -12.0, -1e-9, 0.0,
      1e-9, 11.9999, 12.0, 24.0, 35.9999)
    val a = coords.zipWithIndex
      .map { case (c, i) => (i.toLong, c, c) }.toDF("id_a", "lat_a", "lon_a")
    val b = coords.zipWithIndex
      .map { case (c, i) => (i.toLong + 100, c, -c) }.toDF("id_b", "lat_b", "lon_b")
    val expected = naiveJoin(a, b, r).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(expected.nonEmpty) // the fixture must actually exercise matches
    withRule {
      val rewritten = naiveJoin(a, b, r)
      assert(rewritten.queryExecution.optimizedPlan.toString.contains("__cell"))
      val got = rewritten.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(got === expected)
    }
  }

  test("radius 0 and negative radius: rule declines, results preserved") {
    val a = pts(5, 60).toDF("id_a", "lat_a", "lon_a")
    val b = pts(6, 60).toDF("id_b", "lat_b", "lon_b")
    withRule {
      for (r <- Seq(0.0, -3.0)) {
        val q = naiveJoin(a, b, r)
        // guard: r > 0 — a zero/negative radius must never produce cells
        assert(!q.queryExecution.optimizedPlan.toString.contains("__cell"), s"r=$r")
        assert(q.collect().isEmpty, s"r=$r") // strict < of a nonneg distance
      }
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
