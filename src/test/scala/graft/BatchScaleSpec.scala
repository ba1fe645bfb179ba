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

  test("aqeWidthConfs: corpus-scaled — silent at bench SF, wide at scale") {
    val key = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    // sf0.1 (~17 MB) is far under one 32 MB unit per session-floor
    // partition: NO conf emitted, the recorded 32-wide basis is untouched
    assert(BatchScale.aqeWidthConfs("/root/testdata/sf0.1", 32).isEmpty)
    // a synthetic third-decade footprint opens the width: ceil(bytes/32MB)
    val dir = java.nio.file.Files.createTempDirectory("aqewidth").toFile
    try {
      val f = new java.io.File(dir, "blob.bin")
      val out = new java.io.FileOutputStream(f)
      try out.getChannel.truncate(0) finally out.close()
      val raf = new java.io.RandomAccessFile(f, "rw")
      try raf.setLength(17L << 30) // 17 GiB sparse — dirBytes reads length
      finally raf.close()
      val confs = BatchScale.aqeWidthConfs(dir.toString, 32).toMap
      assert(confs(key).toInt == ((17L << 30) + (32L << 20) - 1) / (32L << 20))
      assert(confs(key).toInt > 500 && confs(key).toInt <= 1024)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete(); ()
    }
  }
}
