package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

object ProfileCapped {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables.documents(spark, sfDir)
    docs.count()
    // warm both paths once, then time
    Dedup.ngramJaccardPairsCapped(docs, 3, 0.8, 20).count()
    Dedup.ngramJaccardPairs(docs, 3, 0.8).count()
    Dedup.minhashLshPairs(docs, 3, 0.8).count()
    time("capped (warm)")(Dedup.ngramJaccardPairsCapped(docs, 3, 0.8, 20).count())
    time("uncapped (warm)")(Dedup.ngramJaccardPairs(docs, 3, 0.8).count())
    time("minhash (warm)")(Dedup.minhashLshPairs(docs, 3, 0.8).count())
    spark.stop()
  }
}
