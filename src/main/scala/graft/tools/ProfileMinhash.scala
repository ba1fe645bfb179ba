package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing for the minhash-LSH dedup hot path (dev tool). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables.documents(spark, sfDir)
    time("docs count")(docs.count())

    val sh = Dedup.shingleSets(docs, 3, "doc_id", "text")
    time("shingleSets materialize")(sh.count())
    time("shingleSets reuse")(sh.count())

    val sig = sh.withColumn("sig", Dedup.minhashSignature(col("ss"), 64))
    time("signatures")(sig.select(sum(element_at(col("sig"), 1))).collect())

    val full = Dedup.minhashLshPairs(docs, 3, 0.8)
    time("full pipeline (1st)")(full.count())
    time("full pipeline (2nd)")(Dedup.minhashLshPairs(docs, 3, 0.8).count())
    spark.stop()
  }
}
