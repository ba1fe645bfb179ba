package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Layered (bronze/silver/gold) parquet table catalog — the engine's stand-in
  * for the reference's Delta-on-MinIO storage (reference:
  * fire_risk_processor.py:77-85, gold_batch_job.py:28-29,83-87). Delta isn't
  * available offline; what the query surface actually needs is: layered
  * paths, append, atomic overwrite (readers never observe a half-written
  * table), write-skip-on-empty, and partitioned layout.
  *
  * Atomic overwrite is temp-dir + rename — single-filesystem rename is
  * atomic on HDFS/local; on S3-class stores swap the rename for a
  * manifest/pointer commit (same interface).
  *
  * Partitioning: the reference README claims time/spatial partitioning but
  * the code never calls partitionBy (SURVEY.md §1.3) — here it's real:
  * `write(..., partitionBy = Seq("region"))` produces hive-style dirs and
  * Spark prunes partitions on `region = 'x'` filters, which is the
  * difference between scanning 100 TB and scanning one region's slice.
  */
final class TableCatalog(spark: SparkSession, root: String,
    format: String = "parquet") {

  def path(layer: String, table: String): String = s"$root/$layer/$table"

  def read(layer: String, table: String): DataFrame =
    spark.read.format(format).load(path(layer, table))

  def exists(layer: String, table: String): Boolean = {
    val p = new Path(path(layer, table))
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  def append(df: DataFrame, layer: String, table: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Append).format(format)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .save(path(layer, table))
  }

  /** Export a snapshot as size-bounded shards of any Spark batch format —
    * `format = "json"` gives JSONL, the lingua franca of training-data
    * interchange. `maxRecordsPerShard` caps rows per output file
    * (`maxRecordsPerFile`), so downstream loaders see uniform shards no
    * matter how lopsided the upstream partitions were; `shards` > 0
    * additionally repartitions for exactly-n-way parallel layout.
    */
  def export(df: DataFrame, layer: String, table: String,
      exportFormat: String = "json", maxRecordsPerShard: Long = 0L,
      shards: Int = 0): Unit = {
    val out = if (shards > 0) df.repartition(shards) else df
    val w = out.write.mode(SaveMode.Overwrite).format(exportFormat)
    (if (maxRecordsPerShard > 0)
       w.option("maxRecordsPerFile", maxRecordsPerShard.toString)
     else w)
      .save(path(layer, table))
  }

  /** Atomic full overwrite: write to `<table>.__tmp`, then rename over the
    * live path. Readers see either the old or the new snapshot, never a
    * partial write — the property Delta's log gave the reference.
    */
  def overwrite(df: DataFrame, layer: String, table: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val live = new Path(path(layer, table))
    val tmp = new Path(path(layer, table) + ".__tmp")
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(tmp)) fs.delete(tmp, true)
    val w = df.write.mode(SaveMode.Overwrite).format(format)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .save(tmp.toString)
    val old = new Path(path(layer, table) + ".__old")
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(live)) fs.rename(live, old)
    fs.rename(tmp, live)
    fs.delete(old, true)
  }

  /** Overwrite only when the new snapshot is non-empty — an empty compute
    * cycle leaves the previous snapshot in place (reference:
    * gold_batch_job.py:81-90). Uses a cheap `isEmpty` (limit-1 scan), not
    * `count()`, and caches the input so the gate and the write don't
    * recompute the plan twice (the reference recomputed; SURVEY.md §3.2
    * step 5 flags it).
    *
    * @return true when a write happened
    */
  def overwriteIfNonEmpty(df: DataFrame, layer: String, table: String,
      partitionBy: Seq[String] = Nil): Boolean = {
    val cached = df.cache()
    try {
      if (cached.isEmpty) false
      else { overwrite(cached, layer, table, partitionBy); true }
    } finally cached.unpersist()
  }
}
