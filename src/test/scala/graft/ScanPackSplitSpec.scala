package graft

import graft.operators.{Packing, Scan, Splits}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix-scan, sequence packing, and leakage-safe splitting. */
class ScanPackSplitSpec extends SparkSpec {
  import spark.implicits._

  test("cumulativeSum equals the single-task window and survives layout") {
    val df = new scala.util.Random(7).shuffle((1L to 5000L).toList)
      .map(i => (i, i % 97 + 1)).toDF("k", "v")
    val naive = df.withColumn("cum",
      sum("v").over(Window.orderBy("k")))
      .select("k", "cum").as[(Long, Long)].collect().sorted
    val scan1 = Scan.cumulativeSum(df, col("k"), col("v"), "cum")
      .select("k", "cum").as[(Long, Long)].collect().sorted
    val scan2 = Scan.cumulativeSum(df.repartition(17), col("k"), col("v"), "cum")
      .select("k", "cum").as[(Long, Long)].collect().sorted
    assert(scan1 === naive)
    assert(scan2 === naive)
  }

  test("cumulativeSum: null order key is retained (bucket 0), not silently dropped") {
    val df = Seq((Some(1L), 10L), (None, 5L), (Some(2L), 20L))
      .toDF("k", "v")
    val got = Scan.cumulativeSum(df, col("k"), col("v"), "cum")
    // the row count is the contract: a null key is outside the uniqueness
    // requirement but must never vanish through the bucket join
    assert(got.count() === 3)
    // null sorts first in the window, so it anchors the running total
    val cums = got.orderBy(col("k").asc_nulls_first)
      .select("cum").as[Long].collect().toSeq
    assert(cums === Seq(5L, 15L, 35L))
  }

  test("cumulativeSum: negative values and a single row") {
    val one = Scan.cumulativeSum(Seq((1L, -7L)).toDF("k", "v"),
      col("k"), col("v"), "cum").select("cum").as[Long].collect()
    assert(one.toSeq === Seq(-7L))
    val df = (1L to 100L).map(i => (i, if (i % 2 == 0) -i else i)).toDF("k", "v")
    val naive = df.withColumn("cum", sum("v").over(Window.orderBy("k")))
      .select("k", "cum").as[(Long, Long)].collect().sorted
    val scan = Scan.cumulativeSum(df, col("k"), col("v"), "cum")
      .select("k", "cum").as[(Long, Long)].collect().sorted
    assert(scan === naive)
  }

  test("cumulativeSum: NaN order keys land in the LAST bucket, matching sort order") {
    // NaN sorts greater than every double in Spark; a binary-search bucket
    // assignment files it at 0 (all comparisons false) — the fix routes it
    // to the last bucket so the running total stays consistent with the
    // window's own ordering. Enough rows that bucket 0 and the last bucket
    // are genuinely different.
    val base = (1 to 2000).map(i => (i.toDouble, 1L))
    val df = (base :+ ((Double.NaN, 5L))).toDF("k", "v")
    val got = Scan.cumulativeSum(df, col("k"), col("v"), "cum")
    assert(got.count() === 2001)
    // the NaN row is last in sort order → its cum is the grand total
    val nanCum = got.filter(isnan(col("k"))).select("cum").as[Long].head()
    assert(nanCum === 2005L)
    // and every real key's total is unaffected by the NaN row
    val maxReal = got.filter(!isnan(col("k")))
      .agg(max("cum")).as[Long].head()
    assert(maxReal === 2000L)
  }

  test("cumulativeSum: non-sketchable order key type fails up front with a clear message") {
    val df = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    val ex = intercept[IllegalArgumentException] {
      Scan.cumulativeSum(df, col("k"), col("v"), "cum")
    }
    assert(ex.getMessage.contains("numeric, date, or timestamp"), ex.getMessage)
  }

  test("cumulativeSum does not run a global single-partition window") {
    val df = spark.range(10000L).toDF("k").withColumn("v", lit(1L))
    val plan = Scan.cumulativeSum(df, col("k"), col("v"), "cum")
      .queryExecution.optimizedPlan.toString
    // every Window in the plan must carry a partition spec (__pid or the
    // p-row offset table); the data-wide window is partitioned by __pid
    assert(plan.contains("__pid"), plan)
  }

  test("packSequences: bins fill to ~capacity, start offsets consistent") {
    val docs = (1L to 200L).map(i => (i, Seq.fill(40)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val packed = Packing.packSequences(docs, capacity = 100)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(packed.forall(_._2 === 40L))
    // 40-token docs, capacity 100: starts at 0,40,80,120,... → bins
    // 0,0,0,1,1,2,2,(2),3...  = floor(40*(i-1)/100)
    packed.foreach { case (id, _, bin) =>
      assert(bin === (40L * (id - 1)) / 100L, s"doc $id")
    }
  }

  test("leakageSafeSplit: clusters never straddle the boundary") {
    val docs = (1L to 300L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (50L, 51L), (51L, 52L),
      (100L, 101L), (200L, 201L), (201L, 202L), (202L, 203L))
      .toDF("doc1", "doc2")
    val split = Splits.leakageSafeSplit(docs, pairs, 0.3)
    val perGroup = split.groupBy("group_key")
      .agg(countDistinct("split").as("n")).as[(Long, Long)].collect()
    assert(perGroup.forall(_._2 === 1L))
    assert(split.count() === 300L)
    // both sides populated at this fraction/corpus size
    val sides = split.select("split").distinct().as[String].collect().toSet
    assert(sides === Set("train", "holdout"))
  }
}
