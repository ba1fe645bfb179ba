package graft

import org.apache.spark.sql.functions._

/** Error envelopes for the sketch aggregates at sf0.01: approximate
  * answers must sit within their advertised bounds of the exact ones.
  */
class ApproxAggSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact") {
    val ev = Tables.events(spark, sf)
    val exact = ev.agg(countDistinct(col("user_id"))).head().getLong(0)
    val approx = ev.agg(approx_count_distinct(col("user_id"), 0.02)).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("percentile_approx p50 within 2% of exact median") {
    val ev = Tables.events(spark, sf)
    val exact = ev.stat.approxQuantile("value", Array(0.5), 0.0).head
    val approx = ev.agg(
      percentile_approx(col("value"), lit(0.5), lit(10000))).head().getDouble(0)
    assert(math.abs(approx - exact) / math.max(exact, 1e-9) <= 0.02,
      s"approx=$approx exact=$exact")
  }
}
