package graft.tools

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic (r15): per-batch watermark behavior with
  * `noDataMicroBatches` on vs off. Demonstrates the TWO-watermark split
  * (SPARK-39931) the replay-gate trims rely on: the late-events filter of
  * batch N uses the PREVIOUS batch's watermark (event-time stats through
  * batch N−2) while eviction uses the current one (stats through N−1) —
  * so with no-data batches off, a row one batch after the corpus max is
  * admitted (filter wm still 0) where the automatic no-data pass used to
  * stand in between. This probe caught exactly that on
  * `events_late_drop_stream` (3385 vs 3375 rows) and motivated its
  * sentinel-between-corpus-and-held-slice batch order.
  * Usage: runMain graft.tools.WmProbe <true|false>
  */
object WmProbe {
  def main(args: Array[String]): Unit = {
    val noData = args(0).toBoolean
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.streaming.noDataMicroBatches.enabled", noData.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val feed = graft.streaming.FileReplay(spark,
      Seq((new Timestamp(0L), "x", 1.0)).toDF("ts", "t", "v").schema)
    val q = feed.stream
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("t"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("probe")
      .outputMode("append").start()
    val H = 3600000L
    feed.stage((1 to 10).map(i => (new Timestamp(i * H), "a", 1.0)).toDF("ts", "t", "v"))
    q.processAllAvailable()
    // stale row at t=2h+1m (window end 3h <= wm 9h50m) -> must drop
    feed.stage(Seq((new Timestamp(2 * H + 60000L), "b", 1.0)).toDF("ts", "t", "v"))
    q.processAllAvailable()
    feed.stage(Seq((new Timestamp(20 * H), "z", 1.0)).toDF("ts", "t", "v"))
    q.processAllAvailable()
    feed.stage(Seq((new Timestamp(24 * H), "z", 1.0)).toDF("ts", "t", "v"))
    q.processAllAvailable()
    q.recentProgress.foreach { p =>
      println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} wm=${p.eventTime.get("watermark")} max=${p.eventTime.get("max")}")
    }
    val out = spark.table("probe").select(col("t"), col("n")).collect()
      .map(r => r.getString(0) + ":" + r.getLong(1)).sorted.mkString(",")
    println(s"[probe] noData=$noData result=$out")
    q.stop(); feed.close(); spark.stop()
  }
}
