package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic interval-overlap join — each side carries VARIABLE-length
  * `[start, end]` intervals and a pair matches when they overlap
  * (`lStart ≤ rEnd ∧ rStart ≤ lEnd`). The general form of the engine's
  * range-join family: the banded theta join (gold_alerts) is the
  * fixed-width special case, the as-of join (q26) the point-probe one.
  *
  * Scale design: both sides explode to the coarse grid buckets their
  * interval covers (`sequence(floor(start/w), floor(end/w))`) and meet in
  * ONE equi join on the bucket id — never a BroadcastNestedLoopJoin theta
  * join. A pair spanning several shared buckets would match once per
  * bucket; instead of a distinct-shuffle to dedup, each pair is KEPT ONLY
  * in the bucket containing its overlap's start
  * (`floor(greatest(lStart, rStart)/w)`), which exists and is unique per
  * pair — so the join output is exact with zero post-join exchanges.
  * `maxBucketsPerInterval` bounds the explode fan-out (an interval longer
  * than `w·max` fails loudly rather than silently flooding the shuffle;
  * raise `bucketWidth` for long intervals).
  */
object IntervalJoin {

  /** `maxPairsPerBucket`: the output-quadratic guard. A bucket holding n_L
    * left × n_R right rows contributes up to n_L·n_R join rows — one hot
    * bucket (every interval overlapping one popular hour) can dominate the
    * whole job's output at corpus scale. With the cap set, buckets whose
    * n_L·n_R product exceeds it are SKIPPED: pairs whose overlap STARTS in
    * a skipped bucket are dropped (pairs starting in any surviving bucket
    * are emitted exactly — both rows still explode into that bucket, and
    * pair attribution is by unique overlap-start bucket). Same bounded-
    * recall trade as the dedup family's df cap / LSH maxBucket: the dense
    * buckets are precisely the template-echo matches a curation pipeline
    * caps anyway, and the guard is decided BEFORE the join from two narrow
    * per-bucket counts, so the quadratic work is never performed. Default
    * None = exact join, zero extra cost.
    */
  def overlapJoin(left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      bucketWidth: Double, maxBucketsPerInterval: Int = 64,
      maxPairsPerBucket: Option[Long] = None): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxPairsPerBucket.forall(_ > 0), "maxPairsPerBucket must be positive")
    def buckets(s: String, e: String): Column =
      sequence(floor(col(s) / bucketWidth).cast("long"),
               floor(col(e) / bucketWidth).cast("long"))
    def guarded(df: DataFrame, s: String, e: String, side: String) = {
      val nb = (floor(col(e) / bucketWidth) - floor(col(s) / bucketWidth) + 1)
        .cast("long")
      df.withColumn("__nb", nb)
        .withColumn("__chk",
          when(col(s) <= col(e) && col("__nb") <= maxBucketsPerInterval,
            lit(true))
            .otherwise(raise_error(concat(lit(
              s"$side interval invalid or spans > $maxBucketsPerInterval " +
                s"buckets at width $bucketWidth: start="), col(s),
              lit(" end="), col(e)))))
        .filter(col("__chk")).drop("__nb", "__chk")
    }
    val l0 = guarded(left, lStart, lEnd, "left")
      .withColumn("__bucket", explode(buckets(lStart, lEnd)))
    val r0 = guarded(right, rStart, rEnd, "right")
      .withColumn("__bucket", explode(buckets(rStart, rEnd)))
    val (l, r) = maxPairsPerBucket match {
      case None => (l0, r0)
      case Some(cap) =>
        // dense-bucket list: count-bounded (one row per over-cap bucket),
        // so it broadcasts; the anti joins stay shuffle-free
        val dense = l0.groupBy("__bucket").agg(count(lit(1)).as("__nl"))
          .join(r0.groupBy("__bucket").agg(count(lit(1)).as("__nr")),
            "__bucket")
          // decimal product: two multi-billion-row sides would wrap a
          // Long product negative and read as sparse (same overflow
          // contract as Dedup.embeddingCosineCertificates)
          .filter(col("__nl").cast("decimal(38,0)") * col("__nr") > cap)
          .select("__bucket")
        (l0.join(broadcast(dense), Seq("__bucket"), "left_anti"),
         r0.join(broadcast(dense), Seq("__bucket"), "left_anti"))
    }
    l.join(r, Seq("__bucket"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      // keep each pair only in its overlap-start bucket: exact dedup with
      // no distinct shuffle
      .filter(col("__bucket") ===
        floor(greatest(col(lStart), col(rStart)) / bucketWidth).cast("long"))
      .drop("__bucket")
  }
}
