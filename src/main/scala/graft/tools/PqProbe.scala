package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** PQ parameter probe: `runMain graft.tools.PqProbe [sfDir]` — checks the
  * lossless point (rerank ≥ corpus ⇒ exact brute-force equality) and
  * measures recall@10 across (m, ksub, rerank) production points, the
  * companion of `RecallProbe` for the ADC path.
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.embeddings(spark, sfDir)
    val q = emb.filter(col("vec_id").isin(0L, 1L, 2L))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bfRows = Similarity.bruteForceTopK(emb, q, 10).collect().toSet
    val bf = bfRows.map(r => (r.getLong(0), r.getLong(1)))
    val t0 = System.nanoTime()
    val px = Similarity.pqTopK(emb, q, 10, rerank = 1000000).collect().toSet
    println(f"[pqprobe] exhaustive == bruteforce: ${px == bfRows} " +
      f"(${(System.nanoTime() - t0) / 1e9}%.2f s)")
    for (m <- Seq(4, 8, 16); ksub <- Seq(8, 16, 32); rr <- Seq(20, 50, 100)) {
      val t1 = System.nanoTime()
      val got = pairs(Similarity.pqTopK(emb, q, 10, m = m, ksub = ksub,
        rerank = rr))
      println(f"[pqprobe] m=$m%2d ksub=$ksub%2d rerank=$rr%3d  " +
        f"recall@10 ${bf.intersect(got).size}/${bf.size}  " +
        f"${(System.nanoTime() - t1) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
