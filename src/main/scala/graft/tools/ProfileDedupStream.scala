package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decompose events_dedup_stream's replay cost: input collect vs the
  * streamed dedup itself vs the memory-sink drain + final aggregate.
  * Usage: runMain graft.tools.ProfileDedupStream [sfDir]
  */
object ProfileDedupStream {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/sf1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (_ <- 1 to 2) {
      val corpus = t("collect corpus") {
        graft.Tables.events(spark, sfDir)
          .select(col("event_id"), col("ts"), col("event_type"), col("value"))
          .as[graft.queries.StreamQueries.DupEvt].collect()
      }
      println(s"[profile] rows=${corpus.length}")
      t("poison copy") { corpus.map(e => e.copy(value = e.value * 3 + 7)) }
      t("batch dedup equivalent") {
        graft.Tables.events(spark, sfDir)
          .select(col("event_id"), col("event_type"), col("value"))
          .dropDuplicates("event_id")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
          .collect()
      }
      // the MemoryStream → memory-sink floor with NO stateful operator:
      // what the replay costs before any dedup state is touched
      t("passthrough stream replay") {
        implicit val sq = spark.sqlContext
        val mem = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[graft.queries.StreamQueries.DupEvt]
        val sink = "profile_pass_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        val q = mem.toDS().select(col("event_id"), col("event_type"), col("value"))
          .writeStream.format("memory").queryName(sink)
          .outputMode("append").start()
        try {
          mem.addData(corpus.toIndexedSeq); q.processAllAvailable()
          mem.addData(corpus.toIndexedSeq); q.processAllAvailable()
        } finally q.stop()
        spark.table(sink).groupBy(col("event_type")).count().collect()
      }
    }
    spark.stop()
  }
}
