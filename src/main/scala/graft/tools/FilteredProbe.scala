package graft.tools

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall probe for the FILTERED composed index (`ivfPqTopKFiltered`):
  * ground truth is brute force over the PRE-FILTERED corpus, so the
  * number reported is pure probe/ADC loss under the predicate — the
  * filter itself cannot cost recall (every ground-truth row passes it).
  * Run: sbt "runMain graft.tools.FilteredProbe [sfDir]"
  */
object FilteredProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 50)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (sel <- Seq(("label % 2 = 0 (~50%)", col("label") % 2 === 0),
                    ("label = 3 (~10%)", col("label") === 3))) {
      val (name, pred) = sel
      val exact = pairs(Similarity.bruteForceTopK(
        emb.filter(pred), queries, k = 10))
      val ann = pairs(Similarity.ivfPqTopKFiltered(emb, queries, k = 10,
        metaFilter = pred, metaCols = Seq("label"),
        nCells = 16, nProbe = 4, dims = 64, m = 8, ksub = 32, rerank = 100))
      val recall = (ann & exact).size.toDouble / exact.size
      println(f"filter $name%-22s recall@10 = $recall%.4f " +
        f"(${(ann & exact).size}/${exact.size})")
    }
    spark.stop()
  }
}
