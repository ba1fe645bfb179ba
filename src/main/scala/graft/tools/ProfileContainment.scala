package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Candidate-volume instrument for the containment dedup's PPJoin-family
  * prefix filter (Dedup.containmentPairs): counts each stage of the
  * candidate funnel — rare-index rows, prefix rows, candidate pairs WITH
  * the prefix filter, the counterfactual candidate pairs WITHOUT it (the
  * pre-r4 plan whose volume made this the inventory's most expensive
  * query), and the verified output — so BASELINE.md can cite measured
  * candidate counts, not just wall-clock. The stage expressions mirror
  * `Dedup.containmentPairs` (same n/threshold/df-cap as the
  * `dedup_containment` inventory entry).
  *
  * Usage: runMain graft.tools.ProfileContainment [sfDir...]
  */
object ProfileContainment {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1")
    graft.streaming.Scratch.install()
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.hadoop.fs.file.impl",
        "graft.streaming.NioLocalFileSystem")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.OracleSidecar.enabled = false
    val (n, threshold, maxShingleDf) = (3, 0.9, 20)
    for (d <- dirs) {
      val docs = graft.Tables.documents(spark, d)
      val sh = graft.operators.Dedup.shingleSets(docs, n, "doc_id", "text")
        .localCheckpoint()
      val ex = sh.select(col("doc_id"), size(col("ss")).as("ns"),
        explode(col("ss")).as("s"))
      val rare = ex.join(
        ex.groupBy("s").agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxShingleDf).select("s"),
        "s").localCheckpoint()
      val prefixLen =
        col("ns") - ceil(col("ns") * lit(threshold * (1 - 1e-12))) + 1
      val pref = rare
        .withColumn("rn",
          row_number().over(Window.partitionBy("doc_id").orderBy("s")))
        .filter(col("rn") <= prefixLen)
        .select(col("doc_id"), col("ns"), col("s"))
      def orient(a: String, b: String) =
        col(s"$a.s") === col(s"$b.s") &&
          (col(s"$a.ns") < col(s"$b.ns") ||
            (col(s"$a.ns") === col(s"$b.ns") &&
              col(s"$a.doc_id") < col(s"$b.doc_id")))
      val withPrefix = pref.as("a").join(rare.as("b"), orient("a", "b"))
        .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
        .dropDuplicates("doc1", "doc2")
      val withoutPrefix = rare.select(col("doc_id"), col("ns"), col("s"))
        .as("a").join(rare.as("b"), orient("a", "b"))
        .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
        .dropDuplicates("doc1", "doc2")
      val out = graft.operators.Dedup.containmentPairs(
        docs, n, threshold, maxShingleDf)
      println(s"[containment] $d docs=${docs.count()} " +
        s"rareRows=${rare.count()} prefixRows=${pref.count()} " +
        s"candWithPrefix=${withPrefix.count()} " +
        s"candWithoutPrefix=${withoutPrefix.count()} " +
        s"verifiedPairs=${out.count()}")
    }
    spark.stop()
  }
}
