package graft

import graft.queries.AnalyticsQueries
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Pins the analytics family's math against independently computed
  * references on a hand-built corpus: OLS closed form, EWMA recursion,
  * rolling z-score, histogram round-half-up shares, mode tiebreak.
  * The corpus is written as events/orders/lineitem parquet so each test
  * drives the REAL NamedQuery end-to-end (same path the driver runs).
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String): (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
    AnalyticsQueries.all.find(_.name == name).get.run

  /** Events at one row per (day, type) slot repeated cnt times; day d maps
    * to 2024-01-(d+1) 12:00 UTC so the epoch-day floor is unambiguous. */
  private def writeEvents(dir: String, rows: Seq[(String, Int, Int)]): Unit = {
    val data = rows.flatMap { case (tpe, day, cnt) =>
      (1 to cnt).map { i =>
        (day.toLong * 1000 + i,
          new Timestamp(1704067200000L + day.toLong * 86400000L + 43200000L),
          i.toLong % 7, tpe, 1.0, "{}")
      }
    }
    data.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("stats_regression recovers a known line exactly (zero residual)") {
    val dir = tmpDir("an-reg")
    // y = 3x + 7 exactly, 2dp-representable: residual 0 → corr 1, slope 3.
    val rows = (1 to 50).map(i =>
      (i.toLong, 1L, 1L, 1, i.toDouble, 3.0 * i + 7.0, 0.0, 0.0, "N", "O",
        new Timestamp(1704067200000L)))
    rows.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = q("stats_regression")(spark, dir).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Double]("slope") === 3.0)
    assert(r.getAs[Double]("intercept") === 7.0)
    assert(r.getAs[Double]("corr") === 1.0)
  }

  test("ts_ewma fold == the scalar recursion, bitwise at round-6") {
    val dir = tmpDir("an-ewma")
    val counts = Seq(5, 9, 2, 14, 7, 7, 1, 30, 4)
    writeEvents(dir, counts.zipWithIndex.map { case (c, d) => ("view", d, c) })
    val got = q("ts_ewma")(spark, dir).orderBy("day")
      .select("ewma").as[Double].collect().toSeq
    val want = counts.tail.scanLeft(counts.head.toDouble) {
      (s, c) => 0.3d * c + 0.7d * s
    }.map(v => BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble)
    assert(got === want)
  }

  test("ts_rolling_zscore emits only full windows and matches hand math") {
    val dir = tmpDir("an-z")
    // 8 days: first 7 flat at 10, day 8 spikes to 31 → z on day 8 is
    // (31−mean)/std over [10,10,10,10,10,10,31]: s1=91, s2=1561;
    // z = (7·31−91)/(7·sqrt((7·1561−91²)/42)) = 126/(7·sqrt(63)) ≈ 2.2678.
    val counts = Seq(10, 10, 10, 10, 10, 10, 10, 31)
    writeEvents(dir, counts.zipWithIndex.map { case (c, d) => ("click", d, c) })
    val rows = q("ts_rolling_zscore")(spark, dir).orderBy("day").collect()
    assert(rows.length === 2) // days 7 and 8 only (windows 1-7, 2-8)
    // Day 7's window is the flat [10×7]: zero variance → principled z = 0.
    assert(rows.head.getAs[Double]("z") === 0.0)
    assert(!rows.head.getAs[Boolean]("anomaly"))
    val z8 = (7.0 * 31 - 91) / (7.0 * math.sqrt((7.0 * 1561 - 91.0 * 91) / 42.0))
    val want = BigDecimal(z8).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows(1).getAs[Double]("z") === want)
    assert(rows(1).getAs[Boolean]("anomaly") === (math.abs(want) >= 2.0))
  }

  test("stats_histogram shares are integer round-half-up basis points") {
    val dir = tmpDir("an-h")
    // 3 orders in bucket 0, 1 in bucket 9 → shares 7500bp / 2500bp.
    val rows = Seq(
      (1L, 1L, "O", 100.0, new Timestamp(0L), "1-URGENT"),
      (2L, 1L, "O", 200.0, new Timestamp(0L), "1-URGENT"),
      (3L, 1L, "O", 49999.0, new Timestamp(0L), "1-URGENT"),
      (4L, 1L, "O", 499999.99, new Timestamp(0L), "1-URGENT"))
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = q("stats_histogram")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === Map(0L -> ((3L, 7500L)), 9L -> ((1L, 2500L))))
  }

  test("stats_mode_median: deterministic tiebreak + exact 2x-cents median") {
    val dir = tmpDir("an-m")
    // Priority A: statuses O and F tie 2-2 → min status 'F' wins.
    // Prices 10.00, 20.00, 30.01, 40.00 → median (20.00+30.01)/2 = 25.005
    // → 2x cents = 5001... (2000+3001) = 5001 cents exactly.
    val rows = Seq(
      (1L, 1L, "O", 10.00, new Timestamp(0L), "A"),
      (2L, 1L, "O", 20.00, new Timestamp(0L), "A"),
      (3L, 1L, "F", 30.01, new Timestamp(0L), "A"),
      (4L, 1L, "F", 40.00, new Timestamp(0L), "A"))
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = q("stats_mode_median")(spark, dir).collect().head
    assert(r.getAs[String]("mode_status") === "F")
    assert(r.getAs[Long]("mode_count") === 2L)
    assert(r.getAs[Long]("median_cents_x2") === 5001L)
  }

  test("ts_autocorr: perfectly alternating series has lag-1 autocorr -1") {
    val dir = tmpDir("an-ac")
    val counts = Seq(4, 8, 4, 8, 4, 8, 4, 8, 4, 8)
    writeEvents(dir, counts.zipWithIndex.map { case (c, d) => ("view", d, c) })
    val out = q("ts_autocorr")(spark, dir).collect()
      .map(r => r.getAs[Int]("lag") -> r.getAs[Double]("autocorr")).toMap
    assert(out(1) === -1.0) // anti-phase
    assert(out(7) === -1.0) // odd lag of a period-2 series is also anti-phase
  }

  test("stats_outliers: exact integer Tukey fences flag the planted spike") {
    val dir = tmpDir("an-out")
    // 11 orders at 100.00 plus one 10000.00 spike: q1=q3=10000 cents,
    // iqr=0 → fences collapse to the cluster; only the spike is outside.
    val rows = (1 to 11).map(i =>
      (i.toLong, 1L, "O", 100.0, new Timestamp(0L), "A")) :+
      (12L, 1L, "O", 10000.0, new Timestamp(0L), "A")
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = q("stats_outliers")(spark, dir).collect().head
    assert(r.getAs[Long]("p25_x4") === 40000L) // 4 × 10000 cents
    assert(r.getAs[Long]("iqr_x4") === 0L)
    assert(r.getAs[Long]("n_outliers") === 1L)
  }

  test("stats_ab_ttest: Welch t matches the closed form on planted groups") {
    val dir = tmpDir("an-t")
    // O: 100, 200, 300 (mean 200); F: 400, 500, 600, 700 (mean 550) — in
    // dollars; cents internally. Exact moments: O n=3 s1=60000 s2=1.4e9;
    // F n=4 s1=220000 s2=1.26e10.
    val rows = Seq(100.0, 200.0, 300.0).zipWithIndex.map { case (p, i) =>
      (i.toLong, 1L, "O", p, new Timestamp(0L), "A") } ++
      Seq(400.0, 500.0, 600.0, 700.0).zipWithIndex.map { case (p, i) =>
        (10L + i, 1L, "F", p, new Timestamp(0L), "A") }
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = q("stats_ab_ttest")(spark, dir).collect().head
    assert(r.getAs[Long]("n_o") === 3L)
    assert(r.getAs[Double]("mean_cents_o") === 20000.0)
    assert(r.getAs[Double]("mean_cents_f") === 55000.0)
    // v1 = 1e8 cents² (sd $100), v2 = 1.6666…e8; se² = v1/3 + v2/4
    val v1 = 1.0e8; val v2 = (4.0 * 1.26e10 - 2.2e5 * 2.2e5) / (4.0 * 3.0)
    val se2 = v1 / 3.0 + v2 / 4.0
    val t = (20000.0 - 55000.0) / math.sqrt(se2)
    val want = BigDecimal(t).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    assert(r.getAs[Double]("t_stat") === want)
  }

  test("stats_chi_square: an exactly independent table scores chi2 = 0") {
    val dir = tmpDir("an-chi")
    // counts(type, day) = rowWeight × colWeight → O == E for every cell.
    val types = Seq("view" -> 1, "click" -> 2)
    val days = Seq(0 -> 1, 1 -> 3) // epoch days (both map to wd 0, 1)
    val rows = for ((t, rw) <- types; (d, cw) <- days) yield (t, d, rw * cw)
    writeEvents(dir, rows)
    val r = q("stats_chi_square")(spark, dir).collect().head
    assert(r.getAs[Double]("chi2") === 0.0)
    assert(r.getAs[Long]("dof") === 1L) // (2−1)(2−1)
  }

  test("stats_entropy: uniform mix hits ln(k), degenerate mix hits 0") {
    val dir = tmpDir("an-e")
    writeEvents(dir,
      Seq(("view", 0, 6), ("click", 0, 6), ("error", 0, 6), // uniform k=3
          ("view", 1, 9))) // single type → H = 0
    val out = q("stats_entropy")(spark, dir).orderBy("day").collect()
    val lnK = BigDecimal(math.log(3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0).getAs[Double]("entropy") === lnK)
    assert(out(0).getAs[Long]("n_types") === 3L)
    assert(out(1).getAs[Double]("entropy") === 0.0)
  }
}
