package graft.tools

import graft.streaming.FileReplay
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pure micro-batch floor probe: 1-row batches through (a) a stateless
  * projection, (b) a watermarked windowed aggregate, (c) a watermarked
  * stream-stream join — how much of a replay trigger is engine machinery
  * independent of data volume?
  */
object ProfileBatchFloor {
  def main(args: Array[String]): Unit = {
    graft.streaming.Scratch.install()
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.hadoop.fs.file.impl",
        "graft.streaming.NioLocalFileSystem")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark
    import s.implicits._
    val one = Seq((1L, new java.sql.Timestamp(1700000000000L), 1.0))
      .toDF("id", "ts", "v")
    def bench(tag: String)(mk: FileReplay => org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row]): Unit = {
      val feed = FileReplay(s, one.schema)
      val q = mk(feed).start()
      for (r <- 1 to 4) {
        val t0 = System.nanoTime()
        feed.stage(one.withColumn("ts",
          lit(new java.sql.Timestamp(1700000000000L + r * 3600000L))))
        q.processAllAvailable()
        println(f"[floor] $tag b$r ${(System.nanoTime() - t0) / 1e9}%.3f s")
        if (r == 3) println(s"[floor] $tag progress ${q.lastProgress.json}")
      }
      q.stop(); feed.close()
    }
    bench("stateless")(f => f.stream.select(col("id"))
      .writeStream.format("memory").queryName("floor_a").outputMode("append"))
    bench("windowed")(f => f.stream.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour")).agg(count(lit(1)))
      .writeStream.format("memory").queryName("floor_b").outputMode("append"))
    val feedB = FileReplay(s, one.schema)
    val feed2 = FileReplay(s, one.schema)
    val q = feed2.stream.withColumnRenamed("id", "id2")
      .withColumnRenamed("ts", "ts2").withWatermark("ts2", "1 hour")
      .join(feedB.stream.withWatermark("ts", "1 hour"),
        expr("id = id2 AND ts2 > ts AND ts2 <= ts + interval 6 hours"),
        "leftOuter")
      .writeStream.format("memory").queryName("floor_c")
      .outputMode("append").start()
    for (r <- 1 to 4) {
      val t0 = System.nanoTime()
      val row = one.withColumn("ts",
        lit(new java.sql.Timestamp(1700000000000L + r * 3600000L)))
      feed2.stage(row.toDF("id", "ts", "v"))
      feedB.stage(row)
      q.processAllAvailable()
      println(f"[floor] ssjoin b$r ${(System.nanoTime() - t0) / 1e9}%.3f s")
      if (r == 3) println(s"[floor] ssjoin progress ${q.lastProgress.json}")
    }
    q.stop(); feed2.close(); feedB.close()
    spark.stop()
  }
}
