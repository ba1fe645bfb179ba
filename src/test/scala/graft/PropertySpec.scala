package graft

import graft.functions.{GeoFunctions, RiskPolicy, TextFunctions}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based laws (SURVEY.md §5.2): ScalaCheck generates the input
  * corpus (seeded — reproducible), one Spark pass per law checks every
  * generated row. Laws: risk classifier totality + monotonicity, distance
  * symmetry/non-negativity/identity, normalization and scrubbing
  * idempotence, shingle-set ordering invariants.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[List[A]]): List[A] =
    g.apply(Gen.Parameters.default, Seed(42L)).get

  private def sample2[A](g: Gen[List[A]], seed: Long): List[A] =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val weatherRows = sample(Gen.listOfN(400, for {
    conf <- Gen.oneOf("h", "n", "l")
    wind <- Gen.choose(0.0, 80.0)
    temp <- Gen.choose(260.0, 330.0)
    hum <- Gen.choose(0.0, 100.0)
  } yield (conf, wind, temp, hum)))

  test("riskLevel is total (always one of the 5 levels)") {
    val out = weatherRows.toDF("conf", "wind", "temp", "hum")
      .select(RiskPolicy.riskLevel($"conf", $"wind", $"temp", $"hum").as("r"))
      .distinct().as[String].collect().toSet
    assert(out.subsetOf(RiskPolicy.levels.toSet))
  }

  test("more wind never lowers risk; less humidity never lowers risk") {
    val df = weatherRows.toDF("conf", "wind", "temp", "hum")
    def rank(w: org.apache.spark.sql.Column, h: org.apache.spark.sql.Column) =
      RiskPolicy.riskRank(RiskPolicy.riskLevel($"conf", w, $"temp", h))
    val violations = df.filter(
      rank($"wind" + 5.0, $"hum") > rank($"wind", $"hum") ||
      rank($"wind", greatest($"hum" - 5.0, lit(0.0))) > rank($"wind", $"hum"))
    assert(violations.count() === 0)
  }

  private val pointPairs = sample(Gen.listOfN(300, for {
    la1 <- Gen.choose(-85.0, 85.0); lo1 <- Gen.choose(-175.0, 175.0)
    la2 <- Gen.choose(-85.0, 85.0); lo2 <- Gen.choose(-175.0, 175.0)
  } yield (la1, lo1, la2, lo2)))

  test("distances: symmetric, non-negative, zero on identical points") {
    val df = pointPairs.toDF("la1", "lo1", "la2", "lo2")
    import GeoFunctions.{euclideanDeg, haversineKm}
    val bad = df.filter(
      abs(euclideanDeg($"la1", $"lo1", $"la2", $"lo2") -
          euclideanDeg($"la2", $"lo2", $"la1", $"lo1")) > 1e-9 ||
      abs(haversineKm($"la1", $"lo1", $"la2", $"lo2") -
          haversineKm($"la2", $"lo2", $"la1", $"lo1")) > 1e-6 ||
      euclideanDeg($"la1", $"lo1", $"la2", $"lo2") < 0 ||
      haversineKm($"la1", $"lo1", $"la2", $"lo2") < 0 ||
      euclideanDeg($"la1", $"lo1", $"la1", $"lo1") =!= 0.0 ||
      haversineKm($"la1", $"lo1", $"la1", $"lo1") > 1e-9)
    assert(bad.count() === 0)
  }

  private val texts = sample(Gen.listOfN(300,
    Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.oneOf("the", "a", "und", "el", "  ", "\t", "x@y.zz",
        "https://a.b/c", "1234567890")))
      .map(_.mkString(" "))))

  test("normText and scrubPii are idempotent on arbitrary text") {
    val df = texts.toDF("t")
    import TextFunctions.{normText, scrubPii}
    val bad = df.filter(
      normText(normText($"t")) =!= normText($"t") ||
      scrubPii(scrubPii($"t")) =!= scrubPii($"t"))
    assert(bad.count() === 0)
  }

  test("shingle sets are strictly ascending (sorted, distinct)") {
    graft.plans.GraftFunctions.ensure(spark)
    val df = texts.filter(_.trim.nonEmpty).toDF("t")
      .select(TextFunctions.tokens($"t").as("toks"))
      .select(graft.plans.GraftColumns.shingleHashSet($"toks", 3).as("ss"))
    val bad = df.filter(exists(
      zip_with(slice($"ss", lit(1), size($"ss") - 1),
        slice($"ss", lit(2), size($"ss") - 1),
        (a, b) => a >= b), x => x))
    assert(bad.count() === 0)
  }

  private val keyedRows = sample(Gen.listOfN(500, for {
    key <- Gen.choose(0L, 40L)
    v <- Gen.choose(0.0, 1.0)
  } yield (key, v))).zipWithIndex.map { case ((k, v), i) => (i.toLong, k, v) }

  test("kAnonymous: keep and suppress slices partition the input exactly") {
    val df = keyedRows.toDF("id", "key", "v")
    for (k <- Seq(1L, 5L, 20L, 1000L)) {
      val kept = graft.operators.Privacy.kAnonymous(df, $"key", k)
        .select("id").as[Long].collect().toSet
      val supp = graft.operators.Privacy.kAnonymous(df, $"key", k, keep = false)
        .select("id").as[Long].collect().toSet
      assert(kept.intersect(supp).isEmpty, s"k=$k overlap")
      assert((kept ++ supp).size === keyedRows.size, s"k=$k not a partition")
      // k=1 keeps everything
      if (k == 1L) assert(supp.isEmpty)
    }
  }

  test("decontamination hits shrink monotonically with minHits and with a smaller bench") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val bench = docs.filter($"doc_id" % 19 === 0)
    val corpus = docs.filter($"doc_id" % 19 =!= 0)
    def flagged(minHits: Int, b: org.apache.spark.sql.DataFrame): Set[Long] =
      graft.operators.Decontaminate.flagContaminated(corpus, b, 3, minHits)
        .select("doc_id").as[Long].collect().toSet
    val at3 = flagged(3, bench); val at5 = flagged(5, bench); val at9 = flagged(9, bench)
    assert(at9.subsetOf(at5) && at5.subsetOf(at3))
    // shrinking the benchmark can only shrink the flag set at fixed minHits
    val smaller = flagged(5, bench.filter($"doc_id" % 38 === 0))
    assert(smaller.subsetOf(at5))
    assert(at3.nonEmpty)
  }

  test("minhash: per-pair slot agreement tracks Jaccard (correlated-slot regression guard)") {
    // THE law the missing mod-P reduction violated: E[slot match] = J per
    // slot, independently enough that every pair concentrates near J. The
    // broken kernel made high slots order by one h2-min shingle, so pairs
    // whose h2-min was private collapsed to ~0.3-0.5 agreement even at
    // J 0.82 — this asserts a 5.6-sd floor per pair, which that kernel
    // fails with probability ≈ 1 over 40 pairs.
    graft.plans.GraftFunctions.ensure(spark)
    val rnd = new scala.util.Random(31)
    val pairs = Seq.tabulate(40) { i =>
      val base = Array.fill(200)(rnd.nextLong())
      (i, base, base.drop(20) ++ Array.fill(20)(rnd.nextLong())) // J = 180/220
    }
    val ms = pairs.toDF("id", "a", "b")
      .select(
        graft.plans.GraftColumns.minhashSig($"a", 64).as("sa"),
        graft.plans.GraftColumns.minhashSig($"b", 64).as("sb"))
      .select(expr("size(filter(zip_with(sa, sb, (x, y) -> x = y), p -> p))").as("m"))
      .as[Int].collect()
    // J ≈ 0.818 → E[m] = 52.4, binomial sd ≈ 2.5; floor 38 ≈ 5.6 sd below
    assert(ms.forall(_ >= 38), s"slot agreements: ${ms.mkString(",")}")
    val mean = ms.map(_.toDouble).sum / (ms.length * 64)
    assert(mean > 0.75 && mean < 0.9, s"mean agreement $mean, want ≈ 0.82")
  }

  test("simhash: identity, locality under small edits, dispersion for unrelated sets") {
    graft.plans.GraftFunctions.ensure(spark)
    val rnd = new scala.util.Random(53)
    val rows = Seq.tabulate(30) { _ =>
      val base = Array.fill(200)(rnd.nextLong())
      (base,
        base.drop(10) ++ Array.fill(10)(rnd.nextLong()), // 5% edit
        Array.fill(200)(rnd.nextLong()))                 // unrelated
    }
    val sigs = rows.toDF("a", "b", "c")
      .select(
        graft.plans.GraftColumns.simhashSig($"a").as("sa"),
        graft.plans.GraftColumns.simhashSig($"a").as("sa2"),
        graft.plans.GraftColumns.simhashSig($"b").as("sb"),
        graft.plans.GraftColumns.simhashSig($"c").as("sc"))
      .collect()
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    val identity = sigs.map(r => ham(r.getLong(0), r.getLong(1)))
    val near = sigs.map(r => ham(r.getLong(0), r.getLong(2)))
    val far = sigs.map(r => ham(r.getLong(0), r.getLong(3)))
    assert(identity.forall(_ == 0))
    // 5% of the weight mass moved → few sign flips; generous 24-bit cap
    assert(near.forall(_ <= 24), s"near hammings: ${near.mkString(",")}")
    // unrelated sets: Binomial(64, 1/2) per pair — 6-sd band [10, 54],
    // and the mean concentrates near 32
    assert(far.forall(h => h >= 10 && h <= 54), s"far hammings: ${far.mkString(",")}")
    val mean = far.map(_.toDouble).sum / far.length
    assert(mean > 24 && mean < 40, s"mean unrelated hamming $mean, want ≈ 32")
  }

  // ---- planted-neighbor recall laws for the ANN family (5 seeds each) ----

  /** One planted corpus: `nFill` random unit vectors (ids seed·10⁶+1000…)
    * plus, per query q (ids seed·10⁶+0…), ONE planted neighbor (id
    * seed·10⁶+5000+q) at EXACTLY cos = `cosTarget` to it (c·q̂ +
    * √(1−c²)·r̂⊥ construction). Fillers are i.i.d. Gaussian → cos ≈ 0 to
    * everything, so the planted vector is the unambiguous true top-1 and
    * recall@k equals candidate-generation hit rate — the quantity the
    * OR-amplification bound speaks about.
    */
  private def planted(seed: Long, nFill: Int, nQueries: Int, dims: Int,
      cosTarget: Double): (Seq[(Long, Array[Float])], Seq[(Long, Array[Float])]) = {
    val rnd = new scala.util.Random(seed)
    def gauss() = Array.fill(dims)(rnd.nextGaussian())
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val base = seed * 1000000L
    val queries = Seq.tabulate(nQueries)(q => (base + q, unit(gauss())))
    val plantedVecs = queries.map { case (qid, qv) =>
      val r = gauss()
      val dot = r.zip(qv).map { case (a, b) => a * b }.sum
      val perp = unit(r.zip(qv).map { case (a, b) => a - dot * b })
      val c = cosTarget
      (qid + 5000L,
        qv.zip(perp).map { case (a, b) => c * a + math.sqrt(1 - c * c) * b })
    }
    val fillers = Seq.tabulate(nFill)(i => (base + 1000L + i, unit(gauss())))
    def f(v: Seq[(Long, Array[Double])]) =
      v.map { case (id, a) => (id, a.map(_.toFloat)) }
    (f(fillers) ++ f(plantedVecs), f(queries.map { case (id, v) => (id, v) }))
  }

  private def recallOf(top: org.apache.spark.sql.DataFrame): Map[Long, Int] =
    top.select($"query_id".cast("long"), $"neighbor_id".cast("long"))
      .as[(Long, Long)].collect()
      .groupBy(_._1 / 1000000L) // seed
      .view.mapValues(_.count { case (q, n) => n == q + 5000L })
      .toMap

  test("multi-table hyperplane LSH: OR-amplified recall floor over 5 planted seeds; a narrowed signature fails it") {
    // cos 0.95 → θ = 0.3176 → per-bit agree p = 1 − θ/π ≈ 0.899. Per 8-bit
    // table, P[≤2 disagreements] ≈ 0.961; missing ALL 7 OR-amplified
    // tables ≈ 0.039⁷ ≈ 1.3e-10 per pair — so at the production point
    // every planted neighbor must surface (floor 48/50 leaves room only
    // for the Rademacher-vs-Gaussian approximation, not for bugs). The
    // SAME corpus at a narrowed signature (1 table, exact-bucket probe)
    // has per-pair hit ≈ p⁸ ≈ 0.43 → 50 pairs concentrate near 21.5
    // (σ ≈ 3.5), so the ≤ 40 ceiling both proves the floor has teeth and
    // pins that OR-amplification is genuinely what buys the recall.
    val seeds = Seq(11L, 12L, 13L, 14L, 15L)
    val corpora = seeds.map(s => planted(s, nFill = 400, nQueries = 10,
      dims = 64, cosTarget = 0.95))
    val corpus = corpora.flatMap(_._1).toDF("vec_id", "embedding")
    val queries = corpora.flatMap(_._2).toDF("vec_id", "embedding")
    val full = recallOf(graft.operators.Similarity.lshTopKMulti(
      corpus, queries, k = 10, nBits = 8, nTables = 7, maxHamming = 2))
    assert(full.values.sum >= 48, s"per-seed hits: $full")
    assert(full.values.forall(_ >= 9), s"per-seed hits: $full")
    val narrowed = recallOf(graft.operators.Similarity.lshTopKMulti(
      corpus, queries, k = 10, nBits = 8, nTables = 1, maxHamming = 0))
    assert(narrowed.values.sum <= 40,
      s"narrowed signature should miss ~57% of pairs, got $narrowed")
  }

  test("IVF: exhaustive probe is exact on 5 planted seeds; production probe holds its floor") {
    // nProbe = nCells probes every cell — provably brute force, so every
    // query's top-1 must be its planted neighbor on every seed (any miss
    // is machinery, not geometry). The production point (4 of 16 cells)
    // loses only pairs that straddle a cell boundary AND whose neighbor
    // cell is outside the query's 4 nearest — rare at cos 0.95; floor set
    // 4σ under the measured 48-50/50.
    val seeds = Seq(21L, 22L, 23L, 24L, 25L)
    var exact = 0; var prod = 0
    for (s <- seeds) {
      val (corpus, queries) = planted(s, nFill = 400, nQueries = 10,
        dims = 64, cosTarget = 0.95)
      val cdf = corpus.toDF("vec_id", "embedding")
      val qdf = queries.toDF("vec_id", "embedding")
      val ex = recallOf(graft.operators.Similarity.ivfTopK(
        cdf, qdf, k = 10, nCells = 16, nProbe = 16))
      exact += ex.values.sum
      val pr = recallOf(graft.operators.Similarity.ivfTopK(
        cdf, qdf, k = 10, nCells = 16, nProbe = 4))
      prod += pr.values.sum
    }
    assert(exact === 50, s"exhaustive IVF missed planted neighbors: $exact/50")
    assert(prod >= 40, s"production IVF recall $prod/50 under floor")
  }

  test("PQ: planted-neighbor recall floor over 5 seeds; a one-centroid codebook fails it") {
    // Production point (m=8, ksub=32, rerank=100): the ADC scan only has
    // to put the planted cos-0.95 neighbor (fillers: i.i.d. cos ≈ 0)
    // inside the top-100-of-~450 candidate cut for the exact re-rank to
    // surface it — sample-seeded codebook quantization error is an order
    // of magnitude below that separation, so the floor matches the IVF
    // law's 40/50. The SAME corpora through a ksub = 1 codebook collapse
    // every subspace to its single centroid: approx_dot is the same
    // constant for every candidate, approx_cos degenerates to
    // const/(qn·cn) — ranking by float-noise in the stored norms of unit
    // vectors, uncorrelated with the planted pair — so the candidate cut
    // admits each planted neighbor w.p. ≈ 100/450 and recall concentrates
    // near 11/50 (σ ≈ 2.9). The ≤ 25 ceiling (≈ +4.8σ) is what gives the
    // floor teeth: a codebook too coarse to rank candidates CANNOT pass
    // this law, which is exactly the regression the rows-only driver
    // check could never catch.
    val seeds = Seq(31L, 32L, 33L, 34L, 35L)
    var prod = 0; var coarse = 0
    for (s <- seeds) {
      val (corpus, queries) = planted(s, nFill = 400, nQueries = 10,
        dims = 64, cosTarget = 0.95)
      val cdf = corpus.toDF("vec_id", "embedding")
      val qdf = queries.toDF("vec_id", "embedding")
      prod += recallOf(graft.operators.Similarity.pqTopK(
        cdf, qdf, k = 10, dims = 64, m = 8, ksub = 32, rerank = 100)).values.sum
      coarse += recallOf(graft.operators.Similarity.pqTopK(
        cdf, qdf, k = 10, dims = 64, m = 8, ksub = 1, rerank = 100)).values.sum
    }
    assert(prod >= 40, s"production PQ recall $prod/50 under floor")
    assert(coarse <= 25,
      s"one-centroid codebook should be candidate-blind, got $coarse/50")
  }

  test("intervalJoin law: equals the brute-force theta join on random intervals") {
    // 3 seeded corpora × 2 bucket widths: the grid explode + overlap-start
    // dedup must reproduce the quadratic truth exactly — including touching
    // endpoints, containment, negative coordinates, and zero-length points
    for (seed <- Seq(7L, 19L, 31L)) {
      val rows = sample2(Gen.listOfN(120, for {
        s <- Gen.choose(-50.0, 50.0)
        len <- Gen.oneOf(Gen.const(0.0), Gen.choose(0.0, 12.0))
      } yield (s, s + len)), seed)
      val (as, bs) = rows.splitAt(60)
      val a = as.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
        .toDF("a_id", "a_start", "a_end")
      val b = bs.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
        .toDF("b_id", "b_start", "b_end")
      val truth = (for {
        ((s1, e1), i) <- as.zipWithIndex
        ((s2, e2), j) <- bs.zipWithIndex
        if s1 <= e2 && s2 <= e1
      } yield (i.toLong, j.toLong)).toSet
      val got = graft.operators.IntervalJoin.overlapJoin(
          a, "a_start", "a_end", b, "b_start", "b_end", bucketWidth = 5.0)
        .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
      assert(got === truth, s"seed=$seed")
    }
  }

  test("chunking laws: full coverage, overlap sharing, lossless reconstruction") {
    val texts = sample(Gen.listOfN(60,
      Gen.choose(1, 40).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("a", "b", "cc", "ddd")).map(_.mkString(" ")))))
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (size, ov) = (6, 2)
    val chunks = graft.operators.Chunking.chunkTokens(docs, size, ov)
      .select($"doc_id", $"chunk_id", $"chunk_text")
      .as[(Long, Int, String)].collect().toSeq
      .groupBy(_._1).map { case (d, cs) => d -> cs.sortBy(_._2).map(_._3) }
    for ((t, i) <- texts.zipWithIndex) {
      val toks = t.split(" ").toSeq
      val cs = chunks(i.toLong)
      // reconstruction: first chunk + each later chunk minus its overlap
      // prefix re-joins to the original token stream (nothing lost/dup'd)
      val rebuilt = cs.head.split(" ").toSeq ++
        cs.tail.flatMap(_.split(" ").toSeq.drop(ov))
      assert(rebuilt === toks, s"doc $i")
      // every chunk except the last is full-size
      cs.init.foreach(c => assert(c.split(" ").length === size, s"doc $i"))
    }
  }

  test("tokenBudgetMix: per-source spend covers the budget, overshoot bounded by one doc") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val budgets = Map("src0" -> 300L, "src1" -> 700L)
    val mix = graft.operators.Mixture.tokenBudgetMix(docs, budgets)
      .groupBy("source").agg(sum("n_tokens").as("spent"),
        max("n_tokens").as("biggest"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    for ((src, budget) <- budgets; (spent, biggest) <- mix.get(src)) {
      assert(spent >= math.min(budget, 1L), s"$src underspent")
      assert(spent < budget + biggest, s"$src overshot by more than one doc")
    }
    assert(mix.keySet === budgets.keySet)
  }
}
