package graft.streaming

import graft.ingest.Normalizer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The Silver streaming layer (SURVEY.md §2.7): raw value stream → JSON
  * parse against explicit schema → flatten → processing-time stamp →
  * append sink with checkpointing — the reference's
  * fire_risk_processor.py:49-89 topology, source-abstracted.
  *
  * The source is any streaming DataFrame with a `value` column: in
  * production a Kafka `readStream`; offline/tests a `MemoryStream[String]`
  * or file source — the capability is "streaming table source", not Kafka
  * specifically (SURVEY §1.1). Exactly-once comes from the checkpoint +
  * idempotent file-sink manifest, same mechanism the reference leaned on
  * (ST2).
  */
object SilverJob {

  /** value-stream → canonical fire events + processing-time stamp (ST4). */
  def fireSilver(raw: DataFrame): DataFrame =
    Normalizer.parseFireJson(raw).withColumn("processed_at", current_timestamp())

  def weatherSilver(raw: DataFrame): DataFrame =
    Normalizer.parseWeatherJson(raw).withColumn("processed_at", current_timestamp())

  /** Event-time upgrade (ST5 — the capability the reference claims but its
    * Double-epoch schema blocks): epoch-seconds Double → TimestampType
    * `event_ts`, watermarked. Downstream can then window, deduplicate
    * within the watermark, and drop late data deterministically.
    */
  def withEventTime(parsed: DataFrame, delayThreshold: String = "10 minutes"): DataFrame =
    parsed
      .withColumn("event_ts", timestamp_seconds(col("timestamp")))
      .withWatermark("event_ts", delayThreshold)

  /** Streaming dedup bounded by the watermark — the README-claimed
    * "Deduplication" that never existed in the reference code (SURVEY §2.7
    * ST5 divergence). Keys: natural identity of a detection.
    */
  def dedupWithinWatermark(withEventTs: DataFrame, keys: Seq[String]): DataFrame =
    withEventTs.dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Tumbling/sliding event-time windowed aggregation (ST5): per-window,
    * per-key stats with partial (map-side) aggregation before the shuffle.
    */
  def windowedStats(withEventTs: DataFrame, keyCol: String,
      window_ : String = "5 minutes", slide: Option[String] = None): DataFrame = {
    val win = slide.fold(window(col("event_ts"), window_))(
      s => window(col("event_ts"), window_, s))
    withEventTs
      .groupBy(win.as("w"), col(keyCol))
      .agg(count(lit(1)).as("n"),
           avg(col("temp_k")).as("avg_temp_k"),
           max(col("temp_k")).as("max_temp_k"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
              col(keyCol), col("n"), col("avg_temp_k"), col("max_temp_k"))
  }

  /** Start an append-mode parquet sink with checkpoint (ST1+ST2; reference:
    * fire_risk_processor.py:73-86).
    */
  def startAppendSink(silver: DataFrame, path: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    silver.writeStream
      .format("parquet")
      .outputMode("append")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** Streaming MERGE sink (CDC upsert): every micro-batch upserts into the
    * versioned catalog table with `orderCol` precedence — the row with the
    * highest `orderCol` wins across the batch, the stored table, AND
    * intra-batch duplicates, so a late out-of-order event in a later
    * micro-batch can never clobber a newer stored row. This is the
    * streaming `MERGE INTO` surface Delta offers: the table converges to
    * latest-row-per-key across restarts, because re-processed batches
    * upsert idempotently (precedence is a pure function of the data),
    * completing exactly-once through the checkpoint + idempotent-merge
    * pair.
    *
    * Cost contract: the merge is COPY-ON-WRITE — every non-empty trigger
    * shuffles batch ∪ stored on the key and commits a full new snapshot,
    * so per-trigger cost grows with TABLE size, not batch size. Right for
    * modest reference tables kept continuously fresh (the gold-view shape
    * of this pipeline); for a large fast-growing table, widen the trigger
    * interval or partition the table and merge per-partition slices — a
    * Delta-style matched-file rewrite is out of scope for a directory
    * catalog with no file-level transaction log.
    */
  def startMergeSink(stream: DataFrame, catalog: graft.catalog.TableCatalog,
      layer: String, table: String, keys: Seq[String], orderCol: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          catalog.merge(batch, layer, table, keys,
            precedence = Some(orderCol))
      }
      .start()

  /** CDC merge sink WITH incremental gold maintenance: each micro-batch
    * (a) merges into the silver table exactly like `startMergeSink`, then
    * (b) reads the change feed between the pre- and post-merge versions
    * (`TableCatalog.changesByKey`) and advances a (count, sum) gold
    * aggregate by that delta alone (`Incremental.applyCountSumDelta`) —
    * the full CDC → MERGE → CDF → incremental-view pipeline in one
    * topology. Per-trigger gold cost is ∝ the batch's CHURN, never the
    * silver table size (the merge itself still rewrites its snapshot —
    * see `startMergeSink`'s scaladoc for that contract); recompute-equality
    * after every batch is pinned in StreamingSpec.
    *
    * The gold table is seeded from the FIRST batch's full aggregate (no
    * prior version exists to diff) and must not pre-exist: a leftover gold
    * from an earlier run would double-count the seed.
    *
    * Crash-exactly-once: the delta is computed from the silver version
    * gold last APPLIED (an atomic `_TAG_` watermark on the gold table,
    * advanced only after the gold commit) — NOT from this batch's
    * pre-merge version. A crash between the silver merge and the gold
    * write replays the batch: the merge re-commits idempotently and the
    * feed then spans BOTH commits from the stale watermark, so the delta
    * is applied exactly once; a crash after the gold write but before the
    * offset-log commit replays too, finds an up-to-date watermark, and
    * applies the (empty) feed as a no-op. Size `keepVersions` to cover
    * the largest plausible replay gap (≥ 2; one extra version per crash
    * between merge and gold-commit).
    */
  def startIncrementalGoldSink(stream: DataFrame,
      catalog: graft.catalog.TableCatalog,
      layer: String, table: String, keys: Seq[String], orderCol: String,
      goldLayer: String, goldTable: String, groupCols: Seq[String],
      valueCol: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          import org.apache.spark.sql.functions._
          val appliedV = catalog.readTag(goldLayer, goldTable, "applied_src_version")
            .map(_.toInt)
          catalog.merge(batch, layer, table, keys,
            precedence = Some(orderCol))
          val postV = catalog.currentVersion(layer, table).get
          val gold = appliedV match {
            case None =>
              catalog.read(layer, table)
                .groupBy(groupCols.map(col): _*)
                .agg(count(lit(1)).as("n"),
                     sum(col(valueCol)).as("total"))
            case Some(v) =>
              graft.operators.Incremental.applyCountSumDelta(
                catalog.read(goldLayer, goldTable),
                catalog.changesByKey(layer, table, keys, v, postV),
                groupCols, "n", "total", valueCol)
          }
          catalog.overwrite(gold, goldLayer, goldTable)
          catalog.writeTag(goldLayer, goldTable, "applied_src_version",
            postV.toString)
        }
      }
      .start()

  /** Scheduled Gold refresh as a streaming job (ST6): instead of the
    * reference's sleep-60 loop, a `foreachBatch` on a trigger recomputes
    * the Gold materialized view each interval — idiomatic replacement with
    * the same cadence contract.
    */
  def startGoldRefresh(silverFires: DataFrame, checkpoint: String,
      interval: String, refresh: DataFrame => Unit): StreamingQuery =
    startGoldRefresh(silverFires, checkpoint, Trigger.ProcessingTime(interval),
      refresh)

  /** Trigger-generalized Gold refresh — `Trigger.AvailableNow` gives the
    * drain-and-stop variant (tests, backfills) with the same foreachBatch
    * body as the production ProcessingTime cadence.
    */
  def startGoldRefresh(silverFires: DataFrame, checkpoint: String,
      trigger: Trigger, refresh: DataFrame => Unit): StreamingQuery =
    silverFires.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) => refresh(batch) }
      .start()
}
