package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Composed-index probe: `runMain graft.tools.IvfPqProbe [sfDir]` —
  * recall@10 of IVF-PQ (raw and residual codes) across (nProbe, rerank)
  * at the production code rate (m=8, ksub=32), against PQ-alone at equal
  * rerank and the IVF-alone ceiling at equal nProbe. Quantifies what the
  * composition trades: the nProbe axis caps recall at IVF's
  * cell-coverage ceiling, the rerank axis buys back ADC ordering loss —
  * and at 100 TB the composed point is the only one whose scan cost is
  * (nProbe/nCells) × (m bytes/row).
  */
object IvfPqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.embeddings(spark, sfDir)
    val q = emb.filter(col("vec_id").isin(0L, 1L, 2L))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = pairs(Similarity.bruteForceTopK(emb, q, 10))
    def line(tag: String, got: Set[(Long, Long)], secs: Double): Unit =
      println(f"[ivfpqprobe] $tag%-42s recall@10 ${bf.intersect(got).size}%2d/${bf.size}  $secs%.2f s")
    def timed(f: => Set[(Long, Long)]): (Set[(Long, Long)], Double) = {
      val t = System.nanoTime(); val r = f; (r, (System.nanoTime() - t) / 1e9)
    }
    for (nProbe <- Seq(2, 4, 8, 16)) {
      val (ivf, ti) = timed(pairs(Similarity.ivfTopK(emb, q, 10,
        nCells = 16, nProbe = nProbe)))
      line(s"ivf       nProbe=$nProbe (ceiling)", ivf, ti)
      for (rr <- Seq(50, 100)) {
        val (raw, tr) = timed(pairs(Similarity.ivfPqTopK(emb, q, 10,
          nCells = 16, nProbe = nProbe, m = 8, ksub = 32, rerank = rr)))
        line(s"ivfpq     nProbe=$nProbe rerank=$rr", raw, tr)
        val (res, ts) = timed(pairs(Similarity.ivfPqTopKResidual(emb, q, 10,
          nCells = 16, nProbe = nProbe, m = 8, ksub = 32, rerank = rr)))
        line(s"ivfpq-res nProbe=$nProbe rerank=$rr", res, ts)
      }
    }
    for (rr <- Seq(50, 100)) {
      val (pq, tp) = timed(pairs(Similarity.pqTopK(emb, q, 10,
        m = 8, ksub = 32, rerank = rr)))
      line(s"pq-alone  rerank=$rr (full-corpus ADC)", pq, tp)
    }
    spark.stop()
  }
}
