package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // 2-D corpus with hand-computable cosines
  private val corpus = Seq(
    (0L, Array(1.0f, 0.0f)),   // query
    (1L, Array(1.0f, 0.1f)),   // cos ≈ .995
    (2L, Array(1.0f, 1.0f)),   // cos ≈ .707
    (3L, Array(0.0f, 1.0f)),   // cos = 0
    (4L, Array(-1.0f, 0.0f)))  // cos = -1
    .toDF("vec_id", "embedding")

  test("brute-force top-k exact order") {
    val got = Similarity.bruteForceTopK(
      corpus, corpus.filter($"vec_id" === 0L), k = 3)
      .orderBy($"rank").select($"neighbor_id").as[Long].collect().toSeq
    assert(got === Seq(1L, 2L, 3L))
  }

  test("LSH ANN: recall vs brute force on clustered corpus (seeded)") {
    val rnd = new scala.util.Random(11)
    // 3 well-separated clusters in 16-D, 40 points each
    val centers = Seq.fill(3)(Array.fill(16)(rnd.nextGaussian().toFloat * 5))
    val rows = for {
      (c, ci) <- centers.zipWithIndex
      i <- 0 until 40
    } yield ((ci * 40 + i).toLong,
      c.map(x => x + rnd.nextGaussian().toFloat * 0.1))
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.filter($"vec_id".isin(0L, 40L, 80L))
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.lshTopK(emb, queries, k = 5, nBits = 8)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    // tight clusters ⇒ multi-probe LSH should recover ≥80% of true neighbors
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("multi-table LSH ANN: recall vs brute force on clustered corpus (seeded)") {
    val rnd = new scala.util.Random(17)
    val centers = Seq.fill(3)(Array.fill(16)(rnd.nextGaussian().toFloat * 5))
    val rows = for {
      (c, ci) <- centers.zipWithIndex
      i <- 0 until 40
    } yield ((ci * 40 + i).toLong,
      c.map(x => x + rnd.nextGaussian().toFloat * 0.1))
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.filter($"vec_id".isin(0L, 40L, 80L))
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.lshTopKMulti(emb, queries, k = 5,
        nBits = 8, nTables = 7, maxHamming = 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("multi-table LSH ANN: exhaustive probe == brute force exactly") {
    // maxHamming = nBits probes every chunk of every table, so the result
    // must reproduce exact top-k through the whole multi-table pipeline
    val got = Similarity.lshTopKMulti(
        corpus, corpus.filter($"vec_id" === 0L), k = 3,
        nBits = 4, nTables = 7, maxHamming = 4)
      .orderBy($"rank").select($"neighbor_id").as[Long].collect().toSeq
    assert(got === Seq(1L, 2L, 3L))
  }

  test("IVF ANN: recall vs brute force on clustered corpus (seeded)") {
    val rnd = new scala.util.Random(23)
    val centers = Seq.fill(4)(Array.fill(16)(rnd.nextGaussian().toFloat * 5))
    val rows = for {
      (c, ci) <- centers.zipWithIndex
      i <- 0 until 30
    } yield ((ci * 30 + i).toLong,
      c.map(x => x + rnd.nextGaussian().toFloat * 0.1f))
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.filter($"vec_id".isin(0L, 30L, 60L, 90L))
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, queries, k = 5, nCells = 8, nProbe = 3)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("PQ ANN: exhaustive rerank == brute force exactly") {
    // rerank ≥ corpus size makes the ADC stage lossless (it can only order
    // candidates, never drop one), so the exact re-rank must reproduce
    // brute-force top-k through the whole codebook/encode/LUT pipeline
    val got = Similarity.pqTopK(
        corpus, corpus.filter($"vec_id" === 0L), k = 3,
        dims = 2, m = 2, ksub = 4, rerank = 100)
      .orderBy($"rank").select($"neighbor_id").as[Long].collect().toSeq
    assert(got === Seq(1L, 2L, 3L))
  }

  test("PQ ANN: recall vs brute force on clustered corpus (seeded)") {
    val rnd = new scala.util.Random(29)
    val centers = Seq.fill(3)(Array.fill(16)(rnd.nextGaussian().toFloat * 5))
    val rows = for {
      (c, ci) <- centers.zipWithIndex
      i <- 0 until 40
    } yield ((ci * 40 + i).toLong,
      c.map(x => x + rnd.nextGaussian().toFloat * 0.1))
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.filter($"vec_id".isin(0L, 40L, 80L))
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    // production-shaped point: 4-byte codes (4× sub-vectors of dim 4),
    // sample codebook, exact re-rank. rerank must cover the quantization
    // TIE SET: every member of a tight cluster encodes to the same codes
    // (ADC can't order within it), so rerank ≥ cluster size (40) is the
    // contract for full recall here — the scaladoc's sizing rule
    val pq = Similarity.pqTopK(emb, queries, k = 5,
        dims = 16, m = 4, ksub = 8, rerank = 45)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("IVF-PQ: nProbe = nCells degenerates to pqTopK exactly") {
    // with every cell probed the IVF stage prunes nothing, so the composed
    // index must reproduce PQ-alone row-for-row (same codebook params) —
    // the identity that pins the composition point's join as lossless
    val rnd = new scala.util.Random(31)
    val rows = (0 until 60).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.filter($"vec_id".isin(0L, 1L))
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"neighbor_id", $"cos", $"rank")
        .as[(Long, Long, Double, Int)].collect().toSet
    val pq = rowsOf(Similarity.pqTopK(emb, queries, k = 5,
      dims = 16, m = 4, ksub = 8, rerank = 20))
    val composed = rowsOf(Similarity.ivfPqTopK(emb, queries, k = 5,
      nCells = 6, nProbe = 6, dims = 16, m = 4, ksub = 8, rerank = 20))
    assert(composed === pq)
  }

  test("IVF-PQ: rerank >= corpus degenerates to ivfTopK exactly") {
    // with a corpus-sized rerank the ADC stage can only order candidates,
    // never drop one, so the composed index must reproduce IVF-alone —
    // the identity that pins encode/LUT/ADC as recall-neutral here
    val rnd = new scala.util.Random(37)
    val rows = (0 until 60).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.filter($"vec_id".isin(0L, 1L))
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"neighbor_id", $"cos", $"rank")
        .as[(Long, Long, Double, Int)].collect().toSet
    val ivf = rowsOf(Similarity.ivfTopK(emb, queries, k = 5,
      nCells = 6, nProbe = 2))
    val composed = rowsOf(Similarity.ivfPqTopK(emb, queries, k = 5,
      nCells = 6, nProbe = 2, dims = 16, m = 4, ksub = 8, rerank = 1000))
    assert(composed === ivf)
  }

  test("filtered IVF-PQ: corpus-sized rerank == brute force over the filtered corpus") {
    // rerank ≥ |filtered corpus| makes the prefix rule probe EVERY cell
    // (the exclusive prefix can never reach rerank + 1), so the candidate
    // set is exactly the filtered corpus and the exact re-score must
    // reproduce brute force over a pre-filtered corpus row-for-row —
    // the lossless law that pins the filter as scan-pruning, not
    // result-changing
    val rnd = new scala.util.Random(41)
    val rows = (0 until 60).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat), i % 3))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val queries = emb.filter($"vec_id".isin(0L, 1L))
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"neighbor_id", $"cos", $"rank")
        .as[(Long, Long, Double, Int)].collect().toSet
    val exact = rowsOf(Similarity.bruteForceTopK(
      emb.filter($"label" === 1), queries, k = 5))
    val filtered = rowsOf(Similarity.ivfPqTopKFiltered(emb, queries, k = 5,
      metaFilter = $"label" === 1, metaCols = Seq("label"),
      nCells = 6, nProbe = 2, dims = 16, m = 4, ksub = 8, rerank = 1000))
    assert(filtered === exact)
  }

  test("filtered IVF-PQ: every neighbor satisfies the predicate; k survives a selective filter") {
    val rnd = new scala.util.Random(43)
    val rows = (0 until 90).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat), i % 5))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val queries = emb.filter($"vec_id".isin(0L, 1L))
    // label 2 keeps 18 of 90 rows — far under what nProbe = 1 of 6 cells
    // would yield unfiltered, so k survivors REQUIRE the probe expansion
    val got = Similarity.ivfPqTopKFiltered(emb, queries, k = 5,
      metaFilter = $"label" === 2, metaCols = Seq("label"),
      nCells = 6, nProbe = 1, dims = 16, m = 4, ksub = 8, rerank = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    assert(got.length === 10, "5 survivors per query despite the filter")
    val labels = got.map(_._2 % 5)
    assert(labels.forall(_ == 2), "every returned neighbor passes the predicate")
  }

  test("IVF-PQ: recall vs brute force on clustered corpus (seeded)") {
    val rnd = new scala.util.Random(41)
    val centers = Seq.fill(4)(Array.fill(16)(rnd.nextGaussian().toFloat * 5))
    val rows = for {
      (c, ci) <- centers.zipWithIndex
      i <- 0 until 30
    } yield ((ci * 30 + i).toLong,
      c.map(x => x + rnd.nextGaussian().toFloat * 0.1f))
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.filter($"vec_id".isin(0L, 30L, 60L, 90L))
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    // production-shaped composition: 3 of 8 cells probed AND 4-byte codes,
    // rerank sized to the quantization tie set (cluster size 30) per the
    // pqTopK sizing rule — the two approximations compound, so this floor
    // pins that composing them does not collapse recall
    val got = Similarity.ivfPqTopK(emb, queries, k = 5,
        nCells = 8, nProbe = 3, dims = 16, m = 4, ksub = 8, rerank = 35)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("residual IVF-PQ: lossless point == brute force exactly") {
    // nProbe = nCells prunes nothing and rerank >= corpus makes ADC
    // order-only, so the whole residual cascade (assignment, residual
    // subtraction, residual codebook, decomposed q·c + LUT scoring) must
    // reproduce exact top-k
    val got = Similarity.ivfPqTopKResidual(
        corpus, corpus.filter($"vec_id" === 0L), k = 3,
        nCells = 2, nProbe = 2, dims = 2, m = 2, ksub = 4, rerank = 100)
      .orderBy($"rank").select($"neighbor_id").as[Long].collect().toSeq
    assert(got === Seq(1L, 2L, 3L))
  }

  test("residual IVF-PQ: recall on clustered corpus at tie-set-sized rerank") {
    val rnd = new scala.util.Random(43)
    val centers = Seq.fill(4)(Array.fill(16)(rnd.nextGaussian().toFloat * 5))
    val rows = for {
      (c, ci) <- centers.zipWithIndex
      i <- 0 until 30
    } yield ((ci * 30 + i).toLong,
      c.map(x => x + rnd.nextGaussian().toFloat * 0.1f))
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.filter($"vec_id".isin(0L, 30L, 60L, 90L))
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    // rerank sized to the quantization tie set (cluster size 30), the
    // same sizing rule as pqTopK — within a tight featureless cluster a
    // SAMPLE-seeded codebook cannot order neighbours from residual noise
    // any more than from raw codes, so the rule is identical
    val got = Similarity.ivfPqTopKResidual(emb, queries, k = 5,
        nCells = 8, nProbe = 3, dims = 16, m = 4, ksub = 8, rerank = 35)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("residual IVF-PQ: resolves within-cluster structure that raw codes collapse") {
    // Each cluster is a mixture of two modes ±d around its center. RAW
    // subvector codes are dominated by the center (scale 5) — both modes
    // quantize near-identically and ADC cannot separate them. RESIDUALS
    // are ±d + noise: two tight modes the sample codebook captures, so
    // residual ADC ranks same-mode candidates first and a HALF-CLUSTER
    // rerank budget still recovers the true neighbours. This is the
    // measurable content of "train the codebook on residuals".
    val rnd = new scala.util.Random(47)
    val centers = Seq.fill(4)(Array.fill(16)(rnd.nextGaussian().toFloat * 5))
    val mode = Array.fill(16)(rnd.nextGaussian().toFloat).map(x => x * 1.5f)
    val rows = for {
      (c, ci) <- centers.zipWithIndex
      i <- 0 until 30
    } yield {
      val sign = if (i % 2 == 0) 1.0f else -1.0f
      ((ci * 30 + i).toLong,
        c.indices.map(j => c(j) + sign * mode(j) +
          rnd.nextGaussian().toFloat * 0.05f).toArray)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.filter($"vec_id".isin(0L, 30L, 60L, 90L))
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    def recallOf(df: org.apache.spark.sql.DataFrame) = {
      val got = df.select($"query_id", $"neighbor_id")
        .as[(Long, Long)].collect().toSet
      (exact & got).size.toDouble / exact.size
    }
    // rerank 16 ≈ one mode's population: enough iff the codes can tell
    // the modes apart
    val raw = recallOf(Similarity.ivfPqTopK(emb, queries, k = 5,
      nCells = 8, nProbe = 3, dims = 16, m = 4, ksub = 8, rerank = 16))
    val res = recallOf(Similarity.ivfPqTopKResidual(emb, queries, k = 5,
      nCells = 8, nProbe = 3, dims = 16, m = 4, ksub = 8, rerank = 16))
    assert(res >= 0.8, s"residual recall $res")
    assert(res >= raw, s"residual ($res) should not trail raw codes ($raw)")
  }

  test("centroid by group: dimension-wise mean") {
    val emb = Seq(
      (1L, Array(1.0f, 3.0f), 0),
      (2L, Array(3.0f, 5.0f), 0),
      (3L, Array(10.0f, 20.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.centroidByGroup(emb, "label")
      .orderBy($"label", $"dim")
      .select($"centroid").as[Double].collect().toSeq
    assert(got === Seq(2.0, 4.0, 10.0, 20.0))
  }

  test("MMR rerank: diversity beats a redundant higher-rel candidate") {
    // query along x; A (id 1) best rel, A' (id 2) is A's near-duplicate
    // (sim ≈ 1 ⇒ marginal score ≈ 0.5·rel − 0.5·1 < 0), C (id 3) diverse
    // with decent rel. Pure top-k picks (1, 2); MMR at λ=0.5 must pick
    // (1, 3).
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.1f, 0.0f)),
      (2L, Array(0.99f, 0.11f, 0.0f)),
      (3L, Array(0.8f, -0.6f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(emb, queryId = 0L, pool = 3, k = 2,
      lambda = 0.5).orderBy($"rank")
      .select($"vec_id").as[Long].collect().toSeq
    assert(got === Seq(1L, 3L))
  }

  test("matryoshka truncation: leading-dim-structured corpus keeps top-k; random does not") {
    // MRL-trained embeddings concentrate signal in leading dims. Model
    // that: 4 informative leading dims (cluster direction) + 12 trailing
    // noise dims at 1/10 the scale. Truncated-to-4 cosine must recover
    // the full-dim neighbor order; the driver corpus (pure random, no
    // leading-dim structure) measures 2/30 recall@10 at 16 of 64 dims —
    // both behaviors are the technique working as specified, corpus
    // deciding (the residual-PQ story again).
    val rnd = new scala.util.Random(7)
    def vec(cluster: Int): Array[Float] = {
      val lead = Array.tabulate(4)(i => if (i == cluster) 1.0f else 0.1f)
      val noise = Array.fill(12)((rnd.nextFloat() - 0.5f) * 0.1f)
      lead ++ noise
    }
    val emb = (0L until 40L).map(i => (i, vec((i % 4).toInt)))
      .toDF("vec_id", "embedding")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"rank").select($"neighbor_id").as[Long].collect().toSet
    val full = ids(Similarity.bruteForceTopK(
      emb, emb.filter($"vec_id" === 0L), k = 9))
    val trunc = ids(Similarity.bruteForceTopK(
      emb.select($"vec_id", slice($"embedding", 1, 4).as("embedding")),
      emb.filter($"vec_id" === 0L)
        .select($"vec_id", slice($"embedding", 1, 4).as("embedding")),
      k = 9))
    // all 9 same-cluster vectors recovered by the 4-dim truncation
    assert((full & trunc).size >= 8,
      s"truncated recall ${(full & trunc).size}/9 on structured corpus")
  }

  test("MMR rerank: λ = 1 degenerates to pure relevance order") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.1f)),
      (2L, Array(1.0f, 1.0f)), (3L, Array(0.0f, 1.0f)),
      (4L, Array(-1.0f, 0.5f)))
      .toDF("vec_id", "embedding")
    val mmr = Similarity.mmrRerank(emb, queryId = 0L, pool = 4, k = 4,
      lambda = 1.0).orderBy($"rank")
      .select($"vec_id").as[Long].collect().toSeq
    val topk = Similarity.bruteForceTopK(
      emb, emb.filter($"vec_id" === 0L), k = 4)
      .orderBy($"rank").select($"neighbor_id").as[Long].collect().toSeq
    assert(mmr === topk)
  }
}
