package graft.tools

import graft.Tables
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: parameter sweep for the recall-companion queries.
  *
  * `RecallProbe table` prints the COVERAGE.md recall-vs-probe-cost table:
  * measured recall@10 against brute force on the sf0.1 driver corpus per
  * (nBits, nTables, maxHamming) / (nCells, nProbe) point, next to the
  * ANALYTIC probed fraction of the search space — for multi-table LSH,
  * nTables · Σ_{i≤h} C(nBits,i) / 2^nBits of the (table, bucket) space;
  * for IVF, nProbe/nCells of the cells.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.headOption.contains("table")) { costTable(spark); spark.stop(); return }
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val emb = Tables.embeddings(spark, d)
      val q = emb.filter(col("vec_id").isin(0L, 1L, 2L))
      val bf = Similarity.bruteForceTopK(emb, q, k = 10)
        .select(col("query_id"), col("neighbor_id"))
      val bfSet = bf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for (mh <- Seq(1, 2, 3, 4)) {
        val ann = Similarity.lshTopK(emb, q, k = 10, nBits = 8, maxHamming = mh)
          .select(col("query_id"), col("neighbor_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        println(s"[$sf] lsh nBits=8 maxHamming=$mh hits=${(ann & bfSet).size}/30")
      }
      for ((nt, mh) <- Seq((4, 1), (7, 0), (7, 1), (7, 2))) {
        val ann = Similarity.lshTopKMulti(emb, q, k = 10, nBits = 8,
            nTables = nt, maxHamming = mh)
          .select(col("query_id"), col("neighbor_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        println(s"[$sf] lshMulti nBits=8 nTables=$nt maxHamming=$mh hits=${(ann & bfSet).size}/30")
      }
      for (np <- Seq(4, 8, 12, 16)) {
        val ann = Similarity.ivfTopK(emb, q, k = 10, nCells = 16, nProbe = np)
          .select(col("query_id"), col("neighbor_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        println(s"[$sf] ivf nCells=16 nProbe=$np hits=${(ann & bfSet).size}/30")
      }
      val docs = Tables.documents(spark, d)
      val exact = Dedup.ngramJaccardPairs(docs, 3, 0.8)
        .select("doc1", "doc2")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for (mb <- Seq(64, 1024)) {
        val s = Dedup.minhashLshPairs(docs, 3, 0.8, maxBucket = mb)
          .select("doc1", "doc2")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        println(s"[$sf] minhash maxBucket=$mb pairs=${s.size} ==exact:${s == exact}")
        if (s != exact) {
          val missing = (exact -- s).toSeq.sorted
          println(s"[$sf] missing pairs: $missing")
          val ids = missing.flatMap(p => Seq(p._1, p._2)).distinct
          val missKeys = missing.map { case (a, b) => s"$a:$b" }
          val info = Dedup.ngramJaccardPairs(docs, 3, 0.8)
            .filter(concat_ws(":", col("doc1"), col("doc2"))
              .isin(missKeys: _*))
            .collect().mkString("; ")
          println(s"[$sf] missing detail: $info")
          val sizes = graft.operators.Dedup
            .minhashLshShingleStore(docs.filter(col("doc_id").isin(ids: _*)), 3)
            .select(col("doc_id"), size(col("ss")).as("ns"))
            .collect().map(r => s"${r.getLong(0)}:${r.getInt(1)}").mkString(" ")
          println(s"[$sf] shingle counts: $sizes")
        }
      }
      val mh = Dedup.minhashLshPairs(docs, 3, 0.8)
        .select("doc1", "doc2")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sh = Dedup.simhashPairs(docs, maxHamming = 6)
        .select("doc1", "doc2")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"[$sf] exact=${exact.size} minhash=${mh.size} (∩=${(mh & exact).size})" +
        s" simhash=${sh.size} (exact⊆simhash=${(exact -- sh).isEmpty}, ∩=${(sh & exact).size})")
      // incremental probe vs exact cross-set jaccard
      val probeB = docs.filter(col("doc_id") % 19 === 0)
      val corpus = docs.filter(col("doc_id") % 19 =!= 0)
      val idx = Dedup.minhashLshIndex(corpus, 3)
      val store = Dedup.minhashLshShingleStore(corpus, 3)
      val probed = Dedup.minhashLshProbe(probeB, idx, store, 3, 0.8)
        .select("doc1", "doc2")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // exact pairs with exactly one side in the probe batch, reoriented
      val crossSet = exact.flatMap { case (a, b) =>
        val (ap, bp) = (a % 19 == 0, b % 19 == 0)
        if (ap && !bp) Some((a, b)) else if (bp && !ap) Some((b, a)) else None
      }
      println(s"[$sf] probe=${probed.size} exactCross=${crossSet.size} equal=${probed == crossSet}")
      // hamming distance distribution over the exact-jaccard pair set
      import graft.functions.VectorFunctions.hammingDistance
      val sigs = Dedup.shingleSets(docs, 3, "doc_id", "text")
        .select(col("doc_id"), graft.plans.GraftColumns.simhashSig(col("ss")).as("sig"))
      for (t <- Seq(0.8, 0.9, 0.95)) {
        val exDf = Dedup.ngramJaccardPairs(docs, 3, t).select("doc1", "doc2")
        val ham = exDf
          .join(sigs.select(col("doc_id").as("doc1"), col("sig").as("s1")), "doc1")
          .join(sigs.select(col("doc_id").as("doc2"), col("sig").as("s2")), "doc2")
          .select(hammingDistance(col("s1"), col("s2")).as("h"))
          .agg(count(lit(1)).as("n"), max(col("h")).as("maxh")).head()
        println(s"[$sf] jaccard>=$t pairs=${ham.getLong(0)} maxHamming=${ham.get(1)}")
      }
    }
    spark.stop()
  }

  private def costTable(spark: SparkSession): Unit = {
    val d = "/root/testdata/sf0.1"
    val emb = Tables.embeddings(spark, d)
    val q = emb.filter(col("vec_id").isin(0L, 1L, 2L))
    val bfSet = Similarity.bruteForceTopK(emb, q, k = 10)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def choose(n: Int, k: Int): Long =
      (0 until k).foldLeft(1L)((a, i) => a * (n - i) / (i + 1))
    println("| op | parameters | probed fraction | recall@10 |")
    println("|---|---|---|---|")
    for {
      nBits <- Seq(8, 12)
      nTables <- Seq(1, 4, 7) if nBits * nTables <= 63
      mh <- Seq(0, 1, 2)
    } {
      val probed = math.min(1.0,
        (0 to mh).map(choose(nBits, _)).sum.toDouble / (1L << nBits))
      val hits = Similarity.lshTopKMulti(emb, q, k = 10, nBits = nBits,
          nTables = nTables, maxHamming = mh)
        .select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        .intersect(bfSet).size
      println(f"| lshTopKMulti | nBits=$nBits nTables=$nTables maxHamming=$mh " +
        f"| ${probed * 100}%.1f%% per table × $nTables | $hits/30 |")
    }
    for (np <- Seq(1, 2, 4, 8, 12, 16)) {
      val hits = Similarity.ivfTopK(emb, q, k = 10, nCells = 16, nProbe = np)
        .select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        .intersect(bfSet).size
      println(f"| ivfTopK | nCells=16 nProbe=$np | ${np * 100.0 / 16}%.1f%% of cells | $hits/30 |")
    }
  }
}
