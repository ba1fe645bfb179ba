package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic shard export — the last step of a training-data pipeline:
  * spread the curated corpus over `nShards` shards so that (a) assignment
  * is a pure function of the row key (re-running the pipeline, on any
  * cluster layout, yields byte-identical shards — auditable, resumable),
  * (b) shards are statistically balanced (md5 is uniform), and (c) files
  * within a shard are bounded in size and internally ordered so downstream
  * loaders stream them without a sort.
  *
  * Scale: the assignment column is a narrow codegen expression (md5 +
  * base-16 parse, no shuffle); the write repartitions once on shard id —
  * the one unavoidable exchange, sized by `nShards`, with per-file row
  * caps bounding task output memory. No driver-side state anywhere.
  */
object Export {

  /** md5-derived shard id in [0, nShards): first 6 hex digits of
    * md5(key) parsed base-16, mod nShards. Same md5-prefix determinism
    * contract as the Sampling family — engine- and layout-independent.
    */
  def shardId(key: Column, nShards: Int): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 6), 16, 10).cast("long"),
      lit(nShards)).cast("int")

  /** Attach `shard_id` to every row. */
  def withShard(df: DataFrame, key: Column, nShards: Int): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    df.withColumn("shard_id", shardId(key, nShards))
  }

  /** Per-shard manifest: row count, total weight (e.g. tokens), and key
    * aggregates that pin the exact membership of each shard (sum + min +
    * max over the key detect any misassignment). One shuffle on shard_id.
    */
  def shardSummary(df: DataFrame, key: Column, weight: Column,
      nShards: Int): DataFrame =
    withShard(df, key, nShards)
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_rows"),
        sum(weight).cast("long").as("total_weight"),
        sum(key).cast("long").as("sum_key"),
        min(key).as("min_key"),
        max(key).as("max_key"))

  /** Epoch-seeded deterministic training order: shard membership stays a
    * pure function of the UNSEEDED key (loaders can pin shard → worker
    * maps across epochs), while the ORDER inside each shard is the
    * lexicographic rank of md5(key ":" seed) — a full reshuffle per epoch
    * from nothing but a seed string, reproducible on any cluster layout
    * (same engine-independent md5 contract as the Sampling family; a
    * training run is re-creatable byte-for-byte from (corpus, seed)).
    *
    * Scale: ONE exchange (hash on shard_id) feeds both the routing and
    * the per-shard row_number window; the sort is per-shard, never
    * global. nShards is the parallelism knob — at 100 TB, thousands of
    * shards keep every sort partition-sized, and positions are contiguous
    * 1..n within each shard, which is exactly the (shard, offset)
    * addressing a data loader resumes from mid-epoch.
    */
  def trainingOrder(df: DataFrame, key: Column, nShards: Int,
      seed: String): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    val epochRank = md5(concat(key.cast("string"), lit(":" + seed)))
    withShard(df, key, nShards)
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard_id")).orderBy(epochRank, key))
        .cast("long"))
  }

  /** Materialize the shards: hive-partitioned by shard_id, each shard's
    * rows sorted by key, files capped at `maxRecordsPerFile` rows. The
    * single exchange routes rows to `nShards` write tasks; within a task,
    * rows are sorted by (shard_id, key) so every emitted file is a sorted
    * key range (pinned in CurationOpsSpec).
    */
  def writeShards(df: DataFrame, key: Column, nShards: Int, outDir: String,
      maxRecordsPerFile: Int): Unit =
    withShard(df, key, nShards)
      .repartition(nShards, col("shard_id"))
      .sortWithinPartitions(col("shard_id"), key)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy("shard_id")
      .parquet(outDir)
}
