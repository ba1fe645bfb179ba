package graft

import graft.operators.Quantiles
import org.apache.spark.sql.functions._

/** The log-linear quantile sketch (`operators/Quantiles.scala`): bucket
  * monotonicity, the merge law, error bounds, and the exact-small-value
  * property.
  */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def mk(vs: Seq[Long], g: String = "a") =
    vs.map(v => (g, v)).toDF("g", "cents")

  test("bucket key is monotone non-decreasing in the value") {
    val vs = (1L to 4096L) ++ Seq(5000L, 123456L, 999999L, 100000000L)
    val got = mk(vs).select(col("cents"),
        Quantiles.hdrBucket(col("cents"), Quantiles.DefaultS).as("b"))
      .orderBy(col("cents")).as[(Long, Long)].collect()
    got.sliding(2).foreach { case Array((v1, b1), (v2, b2)) =>
      assert(b1 <= b2, s"bucket($v1)=$b1 > bucket($v2)=$b2")
    }
  }

  test("values below 2^s index exactly and the midpoint returns them verbatim") {
    val vs = (1L until 32L)
    val got = mk(vs)
      .select(Quantiles.hdrBucketMid(
        Quantiles.hdrBucket(col("cents"), 5), 5).as("mid"), col("cents"))
      .as[(Long, Long)].collect()
    got.foreach { case (mid, v) => assert(mid === v) }
  }

  test("midpoint lies inside its bucket's value range (relative error <= 2^-s)") {
    val vs = Seq(33L, 100L, 1000L, 12345L, 99999L, 12345678L)
    val got = mk(vs).select(col("cents"),
        Quantiles.hdrBucketMid(
          Quantiles.hdrBucket(col("cents"), 5), 5).as("mid"))
      .as[(Long, Long)].collect()
    got.foreach { case (v, mid) =>
      val err = math.abs(mid - v).toDouble / v
      assert(err <= 1.0 / 32 + 1e-9, s"v=$v mid=$mid err=$err")
    }
  }

  test("merge law: sketch(a union b) == merge(sketch(a), sketch(b))") {
    val a = mk((1L to 500L).map(i => i * 37 % 100000 + 1))
    val b = mk((1L to 500L).map(i => i * 91 % 100000 + 1))
    val merged = Quantiles.hdrMerge(
        Quantiles.hdrSketch(a, "g", "cents"),
        Quantiles.hdrSketch(b, "g", "cents"), "g")
      .orderBy(col("__bucket")).collect()
    val direct = Quantiles.hdrSketch(a.unionByName(b), "g", "cents")
      .orderBy(col("__bucket")).collect()
    assert(merged.toSeq === direct.toSeq)
  }

  test("quantile estimate is within 2^-s relative error of the exact quantile") {
    val vs = (1L to 10000L).map(i => (i * 7919) % 1000000 + 1)
    val df = mk(vs)
    val qs = Seq(0.5, 0.9, 0.99)
    val est = Quantiles.hdrDistinctQuantiles(df, "g", "cents", qs)
      .as[(String, Double, Long)].collect().map(r => r._2 -> r._3).toMap
    val sorted = vs.sorted
    qs.foreach { q =>
      val exact = sorted(math.ceil(q * vs.size).toInt - 1)
      val err = math.abs(est(q) - exact).toDouble / exact
      assert(err <= 1.0 / 32 + 1e-9, s"q=$q est=${est(q)} exact=$exact err=$err")
    }
  }

  test("non-positive and null values are excluded from the sketch") {
    val df = Seq(("a", Some(10L)), ("a", Some(0L)), ("a", Some(-5L)),
      ("a", None)).toDF("g", "cents")
    val sk = Quantiles.hdrSketch(df, "g", "cents")
    assert(sk.agg(sum(col("__n"))).head().getLong(0) === 1L)
  }

  test("cumFreq escalation: identical cumulative sums on a unique-values " +
      "corpus, with no task sorting a whole key's domain") {
    // pathological domain: every value distinct (|domain| == |rows|), two
    // keys, sparse value space — the shape where the plain per-key window
    // walks everything in one task
    val freq = spark.range(0L, 200000L)
      .select(when(col("id") % 2 === 0, "even").otherwise("odd").as("k"),
        (col("id") * 37 + 11).as("v"), lit(1L).as("c"))
    val plain = Quantiles.cumFreq(freq, Seq("k"), "v", "c",
        escalateAt = Long.MaxValue)
      .select(col("k"), col("v"), col("__cum"))
    val esc = Quantiles.cumFreq(freq, Seq("k"), "v", "c",
        escalateAt = 1000, targetBuckets = 64)
      .select(col("k"), col("v"), col("__cum"))
    assert(esc.exceptAll(plain).isEmpty && plain.exceptAll(esc).isEmpty,
      "escalated prefix sum must equal the plain window bit-for-bit")
    // no-single-task-sort pin: the escalated plan's domain-sized window
    // partitions by (k, __bkt) — the plain key-only window spec must not
    // appear over the frequency table (only the <=targetBuckets offset
    // cumsum may window by the key alone)
    esc.collect()
    val plan = esc.queryExecution.executedPlan.toString
    assert(plan.contains("__bkt"),
      s"escalated path must range-partition by bucket:\n$plan")
    // and the buckets genuinely spread the domain: with 64 target buckets
    // over a uniform unique domain, the per-(k, bucket) slice each window
    // task sorts is ~100k/64 values — pin it well under the key domain
    val lo = 11L // min of v = id*37 + 11 at id=0
    val span = BigInt(199999L * 37) + 1
    var shift = 0
    while ((span >> shift) > 64) shift += 1
    val maxPerBucket = freq.groupBy(col("k"),
        call_function("shiftright", col("v") - lit(lo), lit(shift)))
      .count().agg(max("count")).head().getLong(0)
    assert(maxPerBucket < 5000L,
      s"domain not spread across buckets: $maxPerBucket per task")
  }
}
