package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Candidate-funnel instrument for `Fuzzy.editDistancePairs` (the r12
  * under-cap block-band fix): block-size histogram, how many rows route
  * through the direct vs segment path, candidate counts per path, and
  * verified pairs — the numbers that justify `splitAt` and prove the
  * segment path's sub-quadratic claim on the real corpus.
  *
  * Usage: `runMain graft.tools.ProfileFuzzy <sfDir> [splitAt]`
  */
object ProfileFuzzy {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val splitAt = if (args.length > 1) args(1).toInt else 512
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (sigLen, blockLen, maxDist, maxBlock) = (16, 4, 3, 10000)
    val docs = graft.Tables.documents(spark, sfDir)
    val sig = docs.select(col("doc_id").cast("long").as("doc_id"),
        substring(lower(col("text")), 1, sigLen).as("sig"))
      .withColumn("b", substring(col("sig"), 1, blockLen))
    val hist = sig.groupBy(col("b")).agg(count(lit(1)).as("n"))
    hist.select(
      count(lit(1)).as("blocks"),
      sum(when(col("n") > maxBlock, 1)).as("culled_blocks"),
      sum(when(col("n") > maxBlock, col("n"))).as("culled_rows"),
      sum(when(col("n") <= maxBlock && col("n") > splitAt, 1))
        .as("segment_blocks"),
      sum(when(col("n") <= maxBlock && col("n") > splitAt, col("n")))
        .as("segment_rows"),
      sum(when(col("n") <= maxBlock && col("n") > splitAt,
        col("n") * col("n") / 2)).as("segment_avoided_pairs"),
      sum(when(col("n") <= splitAt, col("n") * col("n") / 2))
        .as("direct_pairs"),
      max(when(col("n") <= maxBlock, col("n"))).as("largest_retained"))
      .show(false)
    hist.filter(col("n") > splitAt).orderBy(col("n").desc)
      .show(20, false)
    val out = graft.operators.Fuzzy.editDistancePairs(docs, "doc_id",
      "text", sigLen, blockLen, maxDist, maxBlock, splitAt)
    println(s"[fuzzy-funnel] verified pairs = ${out.count()}")
    spark.stop()
  }
}
