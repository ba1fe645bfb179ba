package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Streaming STATE-VOLUME evidence (r14, VERDICT r13 task 6): the stream
  * family's scale story is time-based; the 100 TB risk is STATE — RocksDB
  * keyed volume and commit growth. This main runs the chosen stream gates
  * unmodified and captures every `StreamingQueryProgress`'s
  * `stateOperators` through a session listener (zero changes to the gates
  * — the replays are bounded, so each gate's progress stream is finite),
  * then prints one JSON line per gate with, per state operator:
  * peak/final `numRowsTotal`, peak `memoryUsedBytes`, total rows removed
  * (watermark evictions), and `commitTimeMs` p50/p95/max across batches.
  *
  * What the numbers must show at scale: for the WATERMARKED operators
  * (ss-join family, windows) final state rows track the watermark-live
  * window, not the corpus — rows removed climbs with input while rows
  * total plateaus. `events_dedup_stream` is the documented exception: its
  * watermark delay exceeds the corpus span BY DESIGN (every duplicate
  * must be a state hit), so its state is one entry per key and grows
  * linearly — which is exactly why that gate pins the RocksDB provider +
  * changelog checkpointing. The PRODUCTION default is
  * `events_dedup_window_stream` (r15, VERDICT r14 task 4):
  * `dropDuplicatesWithinWatermark` with the true duplicate-arrival window
  * (24 h against a ~30 d corpus) — its final state and commit p50 must
  * stay arrival-window-bounded across SFs where the keep-everything
  * gate's grow 46×/decade. StreamingSpec's "watermark bounds state"
  * test pins the eviction behavior at fixture scale.
  */
object StateMetrics {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("events_stream_stream_join", "events_stream_stream_outer",
        "events_stream_stream_full_outer", "events_stream_stream_semi",
        "events_window_stream", "events_dedup_stream")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    graft.streaming.Scratch.install()
    // engine-only sinks: measure the pipeline the bench basis measures
    graft.streaming.ReplaySink.engineOnly = true
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.hadoop.fs.file.impl",
        "graft.streaming.NioLocalFileSystem")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // per-operator accumulation across one gate's batches
    final case class OpAgg(name: String) {
      var batches = 0
      var peakRows = 0L
      var lastRows = 0L
      var removed = 0L
      var peakMem = 0L
      val commits = scala.collection.mutable.ArrayBuffer.empty[Long]
    }
    val ops = scala.collection.mutable.LinkedHashMap.empty[String, OpAgg]
    // per-batch engine durationMs components summed across batches — the
    // floor decomposition (where does a replay's per-batch ~0.5 s go?)
    val durTotals = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    var nBatches = 0
    val lock = new Object
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryIdle(e: QueryIdleEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        lock.synchronized {
          nBatches += 1
          e.progress.durationMs.forEach { (k, v) =>
            durTotals(k) = durTotals.getOrElse(k, 0L) + v
          }
          e.progress.stateOperators.zipWithIndex.foreach { case (so, i) =>
            val key = s"${so.operatorName}#$i"
            val agg = ops.getOrElseUpdate(key, OpAgg(so.operatorName))
            agg.batches += 1
            agg.lastRows = so.numRowsTotal
            agg.peakRows = math.max(agg.peakRows, so.numRowsTotal)
            agg.removed += so.numRowsRemoved
            agg.peakMem = math.max(agg.peakMem, so.memoryUsedBytes)
            agg.commits += so.commitTimeMs
          }
        }
    }
    spark.streams.addListener(listener)

    def pct(sorted: Seq[Long], p: Double): Long =
      if (sorted.isEmpty) -1
      else sorted(math.min(sorted.size - 1, (p * sorted.size).toInt))
    names.foreach { name =>
      lock.synchronized { ops.clear(); durTotals.clear(); nBatches = 0 }
      val t0 = System.nanoTime()
      val ok =
        try { graft.BenchAction.consume(
          graft.SparkEntry.queries(name)(spark, sfDir)); true }
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[state] $name FAILED: $e"); false }
      // listener delivery is async; the replays stop their queries before
      // returning, but the final progress event can still be in flight
      Thread.sleep(1500)
      val sec = (System.nanoTime() - t0) / 1e9
      val opsJson = lock.synchronized {
        ops.values.map { a =>
          val sorted = a.commits.sorted.toSeq
          s"""{"op":"${a.name}","batches":${a.batches},""" +
            s""""rows_peak":${a.peakRows},"rows_final":${a.lastRows},""" +
            s""""rows_removed":${a.removed},"mem_peak_bytes":${a.peakMem},""" +
            s""""commit_ms_p50":${pct(sorted, 0.5)},""" +
            s""""commit_ms_p95":${pct(sorted, 0.95)},""" +
            s""""commit_ms_max":${if (sorted.isEmpty) -1 else sorted.last}}"""
        }.mkString("[", ",", "]")
      }
      val durJson = lock.synchronized {
        durTotals.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
      }
      println(s"""{"gate":"$name","ok":$ok,"sec":${math.round(sec * 10) / 10.0},""" +
        s""""n_progress":${lock.synchronized(nBatches)},""" +
        s""""duration_ms_totals":$durJson,""" +
        s""""state_ops":$opsJson,"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
