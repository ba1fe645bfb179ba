package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-knob instrument for SemDeDup (`KMeans.semanticDedupPairs`): the
  * inventory's `dedup_semantic` pins k = |labels| = 10 (the SQL-provable
  * parameter point), which makes the within-cluster pair mass Θ(n²/k) —
  * quadratic in corpus size at FIXED k. The published SemDeDup
  * configuration scales k with the corpus (50k clusters for 100M LAION
  * embeddings) precisely to keep cluster sizes, and therefore the exact
  * all-pairs stage, bounded. This tool measures both regimes on the same
  * corpus: for each requested k it times the Lloyd fit+assign and the
  * pair stage separately, and prints the MEASURED candidate-pair mass
  * Σ c·(c−1)/2 (the quantity the wall-clock must track if the operator
  * is pair-bound rather than secretly super-linear in overhead).
  *
  * Pair-stage action is a `count()` over the pair output: count cannot
  * prune the block join or the cosine-threshold filter (they gate which
  * rows exist), only the final `round(cos,4)` projection — acceptable
  * for an instrument whose subject is candidate volume, and it yields
  * out_rows for free.
  *
  * Usage: runMain graft.tools.ProfileSemantic <sfDir> <maxIter> <k>[,<k>...]
  */
object ProfileSemantic {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val maxIter = args(1).toInt
    val ks = args(2).split(",").map(_.trim.toInt)
    graft.streaming.Scratch.install()
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.hadoop.fs.file.impl",
        "graft.streaming.NioLocalFileSystem")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.OracleSidecar.enabled = false
    val emb = graft.Tables.embeddings(spark, dir).localCheckpoint()
    val n = emb.count()
    for (k <- ks) {
      val t0 = System.nanoTime()
      val assigned = graft.operators.KMeans
        .assignStep(emb, graft.operators.KMeans.fit(emb, k, maxIter))
        .localCheckpoint(eager = true)
      val tFit = (System.nanoTime() - t0) / 1e9
      val cand = assigned.groupBy("cluster").count()
        .agg(sum(col("count") * (col("count") - 1) / 2)).head().getDouble(0)
      val t1 = System.nanoTime()
      val out = graft.operators.Dedup
        .embeddingCosinePairs(assigned, threshold = 0.4,
          blockCol = Some("cluster"))
        .count()
      val tPairs = (System.nanoTime() - t1) / 1e9
      println(f"[semdedup] dir=$dir n=$n k=$k iter=$maxIter " +
        f"fit_assign_s=$tFit%.2f cand_pairs=${cand.toLong} " +
        f"pair_stage_s=$tPairs%.2f out_rows=$out " +
        f"total_s=${tFit + tPairs}%.2f")
    }
    spark.stop()
  }
}
