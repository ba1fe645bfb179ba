package graft.plans

import org.apache.spark.sql.{Column, DataFrame}

/** Corpus-scaled exchange width for BATCH heavies — `StreamScale`'s
  * partition policy generalized to the batch side (VERDICT r14 task 3).
  *
  * Why: the bench contract fixes `spark.sql.shuffle.partitions` at 32,
  * and at the third decade (sf100 ≈ 16 GB corpus) a fixed-width heavy
  * exchange concentrates ~19M rows per sort/aggregate task — external
  * sort spill goes superlinear and collect_list-style aggregations OOM
  * outright (`graph_pagerank` completed at sf100 only under a hand-set
  * SPARK_GRAFT_SHUFFLE=128 + 24g). The fix belongs in the ENGINE: scale
  * the width of the known-heavy exchanges with the data flowing through
  * them, exactly as `StreamScale.parts` scales replay partitions with
  * the corpus.
  *
  * The contract mirrors StreamScale's: `floor` is the session's
  * configured width (the value every recorded basis ≤ sf10 was measured
  * at), so below the engagement threshold the plan is IDENTICAL to the
  * recorded one; above it the width grows as ceil(rows / rowsPerPart),
  * capped to keep task counts sane on a bounded driver. Results are
  * partition-count-invariant (the suite re-runs under
  * GRAFT_TEST_SHUFFLE_PARTITIONS to enforce exactly that), so this is a
  * pure memory-pressure trim — no semantic surface.
  */
object BatchScale {

  /** Rows per task that a 32-core / 8 GiB bench JVM sorts or aggregates
    * comfortably (the sf10 basis runs ~1.9M lineitem rows per task and
    * is linear; spill pathology shows up well past 4M).
    */
  val RowsPerPart = 2000000L

  def parts(nRows: Long, rowsPerPart: Long = RowsPerPart,
      floor: Int = 32, cap: Int = 1024): Int = {
    require(rowsPerPart > 0, "rowsPerPart must be positive")
    require(floor >= 1 && cap >= floor, "need cap >= floor >= 1")
    val want = ((nRows + rowsPerPart - 1) / rowsPerPart).toInt
    math.max(floor, math.min(cap, want))
  }

  /** The session's configured exchange width — the floor every scaled
    * width respects, so sub-threshold plans match the recorded basis.
    */
  def floorOf(df: DataFrame): Int =
    df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt

  /** Data-scaled width for `df` from CATALYST STATS (no job): file-backed
    * relations report summed file bytes, projections/filters scale it.
    * `bytesPerPart` is in the STATS currency (compressed file bytes) —
    * 32 MB of parquet decodes to roughly the RowsPerPart task size.
    */
  def partsFor(df: DataFrame, bytesPerPart: Long = 32L << 20,
      cap: Int = 1024, floor: Int = -1): Int = {
    require(bytesPerPart > 0, "bytesPerPart must be positive")
    val f = if (floor > 0) floor else floorOf(df)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val want = ((bytes + bytesPerPart - 1) / bytesPerPart)
      .min(BigInt(cap)).toInt
    math.max(f, want)
  }

  /** AQE-side width scaling for harness sessions (the general form of
    * this policy): start every adaptive exchange at `initialPartitionNum`
    * and let runtime coalescing size it to the DATA — small shuffles
    * coalesce back toward the core count (`parallelismFirst` is Spark's
    * default, so the bench-SF behavior matches the recorded 32-wide
    * basis), while third-decade exchanges keep up to 512 partitions and
    * per-task state stays bounded with no env override. This covers every
    * groupBy/join/window the per-operator repartition policy doesn't
    * name. Stateful streaming ignores AQE (its width stays the gates'
    * corpus-scaled `StreamScale` contract), and `ckptKeepPartitioning`
    * materializations run AQE-off at the session width, exactly as
    * recorded. `SPARK_GRAFT_INIT_PARTS=0` recovers the old fixed-width
    * posture for A/B.
    */
  def aqeWidthConfs: Seq[(String, String)] = {
    val init = sys.env.getOrElse("SPARK_GRAFT_INIT_PARTS", "512")
    if (init == "0") Nil
    else Seq(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum" -> init)
  }

  /** Global sort at data-scaled width. Semantically identical to
    * `df.orderBy(keys)` — range exchange + per-partition sort IS what
    * orderBy plans — but with the partition count scaled to the data
    * instead of pinned at the session width. Below the engagement
    * threshold it returns plain `orderBy` (AQE keeps its small-SF
    * coalesce; the recorded plans are untouched).
    */
  def sortScaled(df: DataFrame, keys: Column*): DataFrame =
    sortScaledBy(df, 32L << 20, keys: _*)

  /** `sortScaled` with an explicit stats-bytes-per-partition threshold
    * (the spec forces engagement on unit-scale frames through this).
    */
  def sortScaledBy(df: DataFrame, bytesPerPart: Long,
      keys: Column*): DataFrame = {
    val w = partsFor(df, bytesPerPart)
    if (w <= floorOf(df)) df.orderBy(keys: _*)
    else df.repartitionByRange(w, keys: _*).sortWithinPartitions(keys: _*)
  }
}
