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
    for (rep <- 1 to 2) {
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
      s.conf.set("spark.sql.shuffle.partitions", joinParts)
      val q = feedC.stream.withWatermark("c_ts", "1 hour")
        .join(feedB.stream.withWatermark("b_ts", "1 hour"),
          expr("c_user = b_user AND b_ts > c_ts AND " +
               "b_ts <= c_ts + interval 6 hours"),
          "leftOuter")
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      lap("start")
      feedC.stageCached(clicks.filter(unix_millis(col("c_ts")) <= splitTs),
        s"$d#events#clicks#le_mid")
      feedB.stageCached(buys.filter(unix_millis(col("b_ts")) <= splitTs),
        s"$d#events#buys#le_mid")
      lap("stage-b1")
      q.processAllAvailable()
      lap("pAA-1")
      feedC.stageCached(clicks.filter(unix_millis(col("c_ts")) > splitTs),
        s"$d#events#clicks#gt_mid")
      feedB.stageCached(buys.filter(unix_millis(col("b_ts")) > splitTs),
        s"$d#events#buys#gt_mid")
      lap("stage-b2")
      q.processAllAvailable()
      lap("pAA-2")
      val flushTs = new Timestamp(hi + 36000000L)
      feedC.stage(Seq((-1L, flushTs, -1L)).toDF("click_id", "c_ts", "c_user"))
      feedB.stage(Seq((-1L, flushTs, -1L)).toDF("buy_id", "b_ts", "b_user"))
      q.processAllAvailable()
      lap("pAA-3(sentinel1)")
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
