package graft.tools

import java.sql.Timestamp
import graft.Tables
import graft.streaming.FileReplay
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing of the stream-stream outer-join replay: where do the
  * warm seconds go — staging, query start, each processAllAvailable, stop?
  */
object ProfileSSJoin {
  def main(args: Array[String]): Unit = {
    val d = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val joinParts = if (args.length > 1) args(1) else "4"
    graft.streaming.Scratch.install()
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.hadoop.fs.file.impl",
        "graft.streaming.NioLocalFileSystem")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.OracleSidecar.enabled = false
    val s = spark
    import s.implicits._
    // SPARK_GRAFT_SSJ_PROVIDER=ab → interleave hdfs/rocksdb reps in ONE
    // JVM so box-window noise hits both variants equally (min-of-3 each)
    val abMode = sys.env.get("SPARK_GRAFT_SSJ_PROVIDER").contains("ab")
    // SPARK_GRAFT_SSJ_AB_PARTS=a,b interleaves PARTITION counts instead of
    // providers (same one-JVM noise-cancelling discipline)
    val abParts = sys.env.get("SPARK_GRAFT_SSJ_AB_PARTS")
      .map(_.split(",").map(_.trim).toSeq)
    val nReps = if (abMode || abParts.isDefined) 8 else 2
    var partsThisRep = joinParts
    for (rep <- 1 to nReps) {
      if (abMode) {
        val rocks = rep % 2 == 0
        s.conf.set("spark.sql.streaming.stateStore.providerClass",
          if (rocks)
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
          else
            "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
        s.conf.set("spark.sql.streaming.stateStore.rocksdb." +
          "changelogCheckpointing.enabled", "true")
        println(s"[ssj:$rep] provider=" + (if (rocks) "rocksdb" else "hdfs"))
      }
      abParts.foreach { ps =>
        partsThisRep = ps((rep - 1) % ps.length)
        println(s"[ssj:$rep] parts=" + partsThisRep)
      }
      var t0 = System.nanoTime()
      def lap(tag: String): Unit = {
        val t = System.nanoTime()
        println(f"[ssj:$rep] $tag ${(t - t0) / 1e9}%.3f s"); t0 = t
      }
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("ts").as("c_ts"),
          col("user_id").as("c_user"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("buy_id"), col("ts").as("b_ts"),
          col("user_id").as("b_user"))
      val mm = ev.filter(col("event_type").isin("click", "purchase"))
        .agg(min(col("ts")), max(col("ts"))).head()
      val (lo, hi) = (mm.getTimestamp(0).getTime, mm.getTimestamp(1).getTime)
      val splitTs = lo + (hi - lo) / 2
      lap("minmax")
      val feedC = FileReplay(s, clicks.schema)
      val feedB = FileReplay(s, buys.schema)
      val sink = "graft_prof_ssj_" + rep
      val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", partsThisRep)
      // A/B axes for the trigger-floor hunt (env-selected):
      //   SPARK_GRAFT_SSJ_PROVIDER=rocksdb[_nochangelog]
      //   SPARK_GRAFT_SSJ_MIN_BATCHES=<n> (minBatchesToRetain, default 100)
      sys.env.get("SPARK_GRAFT_SSJ_PROVIDER").foreach {
        case p if p.startsWith("rocksdb") =>
          s.conf.set("spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
          s.conf.set("spark.sql.streaming.stateStore.rocksdb." +
            "changelogCheckpointing.enabled",
            (!p.contains("nochangelog")).toString)
        case _ => ()
      }
      sys.env.get("SPARK_GRAFT_SSJ_MIN_BATCHES").foreach(n =>
        s.conf.set("spark.sql.streaming.minBatchesToRetain", n))
      val q = feedC.stream.withWatermark("c_ts", "1 hour")
        .join(feedB.stream.withWatermark("b_ts", "1 hour"),
          expr("c_user = b_user AND b_ts > c_ts AND " +
               "b_ts <= c_ts + interval 6 hours"),
          "leftOuter")
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      lap("start")
      // SPARK_GRAFT_SSJ_COALESCE=n stages each batch as n part files
      // instead of one-per-core (~32): same rows, same batch boundaries,
      // same hashes — an A/B for the file-count share of the floor
      val co = sys.env.get("SPARK_GRAFT_SSJ_COALESCE").map(_.toInt)
      def shape(df: org.apache.spark.sql.DataFrame) =
        co.map(df.coalesce).getOrElse(df)
      val ck = co.map(n => s"#co$n").getOrElse("")
      feedC.stageCached(shape(clicks.filter(unix_millis(col("c_ts")) <= splitTs)),
        s"$d#events#clicks#le_mid$ck")
      feedB.stageCached(shape(buys.filter(unix_millis(col("b_ts")) <= splitTs)),
        s"$d#events#buys#le_mid$ck")
      lap("stage-b1")
      q.processAllAvailable()
      lap("pAA-1")
      feedC.stageCached(shape(clicks.filter(unix_millis(col("c_ts")) > splitTs)),
        s"$d#events#clicks#gt_mid$ck")
      feedB.stageCached(shape(buys.filter(unix_millis(col("b_ts")) > splitTs)),
        s"$d#events#buys#gt_mid$ck")
      lap("stage-b2")
      q.processAllAvailable()
      lap("pAA-2")
      val flushTs = new Timestamp(hi + 36000000L)
      feedC.stage(Seq((-1L, flushTs, -1L)).toDF("click_id", "c_ts", "c_user"))
      feedB.stage(Seq((-1L, flushTs, -1L)).toDF("buy_id", "b_ts", "b_user"))
      q.processAllAvailable()
      lap("pAA-3(sentinel1)")
      // engine-reported per-batch phase durations: where the trigger floor
      // actually goes (planning vs WAL vs state commit vs addBatch)
      q.recentProgress.foreach { p =>
        val dur = p.durationMs
        println(s"[ssj:$rep] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=$dur stateRows=${p.stateOperators.map(_.numRowsTotal).mkString(",")} " +
          s"commitMs=${p.stateOperators.map(_.commitTimeMs).mkString(",")}")
      }
      q.stop()
      lap("stop")
      val n = s.table(sink).filter(col("c_user") >= 0).count()
      feedC.close(); feedB.close()
      s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      lap(s"collect($n)")
    }
    spark.stop()
  }
}
