package graft

import graft.plans.BatchScale
import org.apache.spark.sql.functions._

/** Data-scaled exchange width for batch heavies (`plans/BatchScale`,
  * VERDICT r14 task 3): below the engagement threshold every policy is a
  * no-op (recorded plans stay byte-identical), above it widths grow with
  * the data and stay capped; `sortScaled` must be semantically identical
  * to `orderBy` at ANY width.
  */
class BatchScaleSpec extends SparkSpec {

  test("parts: ceil math, floor below threshold, cap above") {
    assert(BatchScale.parts(0L) == 32)
    assert(BatchScale.parts(2000000L) == 32)
    assert(BatchScale.parts(64000000L) == 32, "exactly floor-many wanted")
    assert(BatchScale.parts(100000000L) == 50)
    assert(BatchScale.parts(100000001L) == 51, "ceil, not floor division")
    assert(BatchScale.parts(3000000000L) == 1024, "cap bounds the width")
    assert(BatchScale.parts(100L, floor = 7) == 7)
  }

  test("partsFor: a unit-scale frame never leaves the session floor") {
    val df = spark.range(100).toDF("id")
    assert(BatchScale.partsFor(df, floor = 7) == 7)
    assert(BatchScale.partsFor(df) == BatchScale.floorOf(df))
  }

  test("sortScaled == orderBy at the floor AND when forced past it") {
    val df = spark.range(1000)
      .select((col("id") * 7919 % 997).as("k"), col("id").as("v"))
    val plain = df.orderBy(col("k"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // default threshold: unit-scale frame stays plain orderBy
    val atFloor = BatchScale.sortScaled(df, col("k"), col("v"))
    assert(atFloor.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == plain)
    // forced engagement: width must exceed the floor, order must hold
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val scaled = BatchScale.sortScaledBy(df,
      (bytes / 10).max(BigInt(1)).toLong, col("k"), col("v"))
    assert(scaled.rdd.getNumPartitions > BatchScale.floorOf(df),
      "forced threshold must engage the scaled path")
    assert(scaled.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == plain)
  }

  test("aqeWidthConfs: default posture sets the initial width knob") {
    val confs = BatchScale.aqeWidthConfs.toMap
    assert(confs.get(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum")
      .contains("512"))
  }
}
