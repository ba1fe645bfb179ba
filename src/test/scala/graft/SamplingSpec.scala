package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling: reproducibility across partition
  * layouts, approximate rate, and exact stratified quotas.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0L until 2000L)
    .map(i => (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "es"))
    .toDF("doc_id", "lang")

  test("hashBernoulli is partition-layout independent and ~fraction") {
    val a = Sampling.hashBernoulli(docs, col("doc_id"), 0.2)
      .select("doc_id").as[Long].collect().sorted
    val b = Sampling.hashBernoulli(docs.repartition(13), col("doc_id"), 0.2)
      .select("doc_id").as[Long].collect().sorted
    assert(a === b)
    assert(math.abs(a.length / 2000.0 - 0.2) < 0.05)
  }

  test("hashBernoulli boundary fractions: 1.0 is the identity, 0.0 is empty") {
    val df = (1L to 5000L).toDF("id")
    assert(Sampling.hashBernoulli(df, col("id"), 1.0).count() === 5000L)
    assert(Sampling.hashBernoulli(df, col("id"), 0.0).count() === 0L)
  }

  test("hashBernoulli nests: 10% sample is a subset of the 20% sample") {
    val small = Sampling.hashBernoulli(docs, col("doc_id"), 0.1)
      .select("doc_id").as[Long].collect().toSet
    val big = Sampling.hashBernoulli(docs, col("doc_id"), 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(small.subsetOf(big))
  }

  test("stratifiedQuota: exact quota per stratum, deterministic") {
    val s1 = Sampling.stratifiedQuota(docs, col("lang"), col("doc_id"), 40)
    val counts = s1.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts === Map("en" -> 40L, "de" -> 40L, "es" -> 40L))
    val s2 = Sampling.stratifiedQuota(docs.repartition(7), col("lang"),
      col("doc_id"), 40).select("doc_id").as[Long].collect().sorted
    assert(s2 === s1.select("doc_id").as[Long].collect().sorted)
  }

  test("weightedTopK: layout-independent, heavier rows overrepresented") {
    val weighted = docs.withColumn("w",
      when(col("doc_id") < 100, 50L).otherwise(1L))
    val a = Sampling.weightedTopK(weighted, col("doc_id"), col("w"), 100)
      .select("doc_id").as[Long].collect().sorted
    val b = Sampling.weightedTopK(weighted.repartition(9), col("doc_id"),
      col("w"), 100).select("doc_id").as[Long].collect().sorted
    assert(a === b)
    // 5% of rows carry weight 50 (~72% of total mass) — they must take far
    // more than 5% of the sample
    val heavy = a.count(_ < 100)
    assert(heavy > 30, s"heavy=$heavy of 100")
  }

  test("stratifiedQuota caps at stratum size") {
    val tiny = Seq((1L, "en"), (2L, "en"), (3L, "de")).toDF("doc_id", "lang")
    val got = Sampling.stratifiedQuota(tiny, col("lang"), col("doc_id"), 10)
    assert(got.count() === 3)
  }
}
