package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Planted-corpus tests for the dedup family: near-dup pairs the operators
  * must find, distractors they must not, and LSH recall pinned against the
  * exact-Jaccard oracle op.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  // doc 1≈2 (one token changed of 12), 3≈4 (two tokens appended), 5-7 distinct
  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river"),
    (2L, "the quick brown fox jumps over the lazy cat near the river"),
    (3L, "large scale data processing with spark requires careful partitioning design " +
      "because shuffle volume dominates the cost of every join and aggregation " +
      "when the cluster reads terabytes from object storage every single hour"),
    (4L, "large scale data processing with spark requires careful partitioning design " +
      "because shuffle volume dominates the cost of every join and aggregation " +
      "when the cluster reads terabytes from object storage every single hour indeed"),
    (5L, "completely unrelated text about cooking pasta with tomato sauce basil"),
    (6L, "der schnelle braune fuchs springt ueber den faulen hund am fluss"),
    (7L, "the quick brown fox jumps over the lazy dog near the river"), // exact dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup groups identical normalized text") {
    val d = Dedup.exact(docs)
    assert(d.count() === 6) // 7 docs, one exact dup pair
    val dup = d.filter($"n_copies" === 2).collect()
    assert(dup.length === 1 && dup(0).getAs[Long]("keep_id") === 1L)
  }

  test("ngram Jaccard finds planted near-dups and no distractors") {
    val pairs = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5)
      .select($"doc1", $"doc2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((3L, 4L)) &&
      pairs.contains((1L, 7L)) && pairs.contains((2L, 7L)))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
    assert(!pairs.exists(p => p._1 == 6L || p._2 == 6L))
  }

  test("df-capped ngram candidates match the exact op when dups share rare shingles") {
    // append one ubiquitous boilerplate sentence to EVERY doc: its shingles
    // have df = n_docs and would dominate the uncapped self-join fan-out
    val boiler = docs.withColumn("text",
      concat(col("text"), lit(" this document is provided under the standard license agreement")))
    val exact = Dedup.ngramJaccardPairs(boiler, 3, 0.5)
      .select("doc1", "doc2").as[(Long, Long)].collect().toSet
    val capped = Dedup.ngramJaccardPairsCapped(boiler, 3, 0.5, maxShingleDf = 3)
      .select("doc1", "doc2").as[(Long, Long)].collect().toSet
    assert(capped === exact)
    assert(capped.contains((1L, 2L)) && capped.contains((3L, 4L)))
    // jaccard values are exact (full-set verification), not candidate-only
    val j = Dedup.ngramJaccardPairsCapped(boiler, 3, 0.5, maxShingleDf = 3)
      .filter(col("doc1") === 1L && col("doc2") === 7L)
      .select("jaccard").as[Double].head()
    assert(j === 1.0)
  }

  test("containment finds doc-in-doc inclusion that Jaccard misses") {
    // doc 8 = doc 3's text embedded in a much larger wrapper: J is tiny
    // (|S(3)| ≪ |S(8)|) but C(3→8) = 1.0 — the asymmetric case
    // unique filler tokens (repetition would dedupe to a handful of
    // distinct shingles and leave J large)
    val wrapper = (1 to 120).map(i => s"header$i").mkString(" ") + " " +
      "large scale data processing with spark requires careful partitioning design " +
      "because shuffle volume dominates the cost of every join and aggregation " +
      "when the cluster reads terabytes from object storage every single hour " +
      (1 to 120).map(i => s"footer$i").mkString(" ")
    val corpus = docs.union(Seq((8L, wrapper)).toDF("doc_id", "text"))
    val jacc = Dedup.ngramJaccardPairs(corpus, n = 3, threshold = 0.5)
      .select($"doc1", $"doc2").as[(Long, Long)].collect().toSet
    assert(!jacc.contains((3L, 8L))) // symmetric measure is blind to it
    val cont = Dedup.containmentPairs(corpus, n = 3, threshold = 0.9,
      maxShingleDf = 6)
    val hit = cont.filter($"contained" === 3L && $"container" === 8L)
      .select("containment").as[Double].collect()
    assert(hit.length === 1 && hit(0) === 1.0)
    // distractors (5: pasta, 6: german) are contained in nothing
    assert(cont.filter($"contained".isin(5L, 6L)).count() === 0)
    // the FULL expected pair set, directed: 1⊆7 (exact dup, tie → lower id
    // contained), 3⊆4 (prefix of it), 3⊆8 (the planted inclusion), and
    // 4⊆8 (doc 4 = doc 3 + one appended token, so all but one of its
    // shingles sit inside the wrapper: C = k/(k+1) ≈ 0.97 ≥ 0.9). The
    // (1,2)/(2,7) near-dups sit at C = 0.7 and must NOT appear.
    val got = cont.select("contained", "container").as[(Long, Long)]
      .collect().toSet
    assert(got === Set((1L, 7L), (3L, 4L), (3L, 8L), (4L, 8L)))
    // direction invariant: the contained side's shingle set is never larger
    // than the container's, for EVERY emitted row
    val shSizes = corpus.select($"doc_id",
      size(graft.plans.GraftColumns.shingleHashSet(
        graft.functions.TextFunctions.tokens($"text"), 3)).as("nsh"))
    val dir = cont
      .join(shSizes.select($"doc_id".as("contained"), $"nsh".as("n_in")), "contained")
      .join(shSizes.select($"doc_id".as("container"), $"nsh".as("n_out")), "container")
      .filter($"n_in" > $"n_out")
    assert(dir.count() === 0)
  }

  test("containment prefix filter is lossless vs brute force across thresholds") {
    // 24-doc corpus: 8 base docs of distinct content, for each a ~90%
    // prefix-truncated copy (containment just above/below 0.9 depending on
    // rounding) and a wrapped copy (full inclusion) — plus the boundary
    // cases the prefix length formula must survive: tiny docs (prefix
    // length 1) and exact duplicates (threshold 1.0).
    val base = (0 until 8).map { i =>
      val toks = (0 until 40).map(j => s"w${i}_$j")
      (i.toLong, toks.mkString(" "))
    }
    val truncated = base.map { case (id, text) =>
      (id + 100L, text.split(" ").take(36).mkString(" "))
    }
    val wrapped = base.map { case (id, text) =>
      (id + 200L, s"pre${id}a pre${id}b pre${id}c " + text + s" post${id}a post${id}b")
    }
    val corpus = (base ++ truncated ++ wrapped).toDF("doc_id", "text")

    // brute-force reference: every pair sharing >= 1 rare shingle, C
    // computed on FULL sets — the operator's contract, sans prefix filter
    def brute(t: Double, cap: Int): Set[(Long, Long, Double)] = {
      val sh = corpus.select($"doc_id",
        graft.plans.GraftColumns.shingleHashSet(
          graft.functions.TextFunctions.tokens($"text"), 3).as("ss"))
      val ex = sh.select($"doc_id", explode($"ss").as("s"))
      val rareS = ex.groupBy("s").count().filter($"count" <= cap).select("s")
      val rarePairs = ex.join(rareS, "s").as("x")
        .join(ex.join(rareS, "s").as("y"),
          col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc1"), col("y.doc_id").as("doc2"))
        .distinct()
      rarePairs
        .join(sh.select($"doc_id".as("doc1"), $"ss".as("ss1")), "doc1")
        .join(sh.select($"doc_id".as("doc2"), $"ss".as("ss2")), "doc2")
        .withColumn("common", size(array_intersect($"ss1", $"ss2")))
        .withColumn("c", $"common".cast("double") / least(size($"ss1"), size($"ss2")))
        .filter($"c" >= t)
        .select(
          when(size($"ss1") <= size($"ss2"), $"doc1").otherwise($"doc2"),
          when(size($"ss1") <= size($"ss2"), $"doc2").otherwise($"doc1"),
          round($"c", 4))
        .as[(Long, Long, Double)].collect().toSet
    }
    for (t <- Seq(0.8, 0.9, 1.0)) {
      val fast = Dedup.containmentPairs(corpus, n = 3, threshold = t,
          maxShingleDf = 10)
        .as[(Long, Long, Double)].collect().toSet
      assert(fast === brute(t, 10), s"prefix filter lost/invented pairs at t=$t")
    }
  }

  test("minhash LSH recall = 1.0 vs exact Jaccard on the planted corpus") {
    val exact = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5)
      .select($"doc1", $"doc2").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(docs, n = 3, threshold = 0.5)
      .select($"doc1", $"doc2").as[(Long, Long)].collect().toSet
    assert(lsh === exact) // exact-verify step ⇒ no false positives either
  }

  test("incremental LSH: probe a new batch against the prebuilt index") {
    // index docs 1-7 once
    val index = Dedup.minhashLshIndex(docs, n = 3)
    val store = Dedup.minhashLshShingleStore(docs, n = 3)
    // new batch: a near-dup of indexed doc 3 + a novel doc
    val batch = Seq(
      (100L, "large scale data processing with spark requires careful partitioning design " +
        "because shuffle volume dominates the cost of every join and aggregation " +
        "when the cluster reads terabytes from object storage every single hour truly"),
      (101L, "entirely new content about gardening tulips in the spring sunshine")
    ).toDF("doc_id", "text")
    val hits = Dedup.minhashLshProbe(batch, index, store, n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(hits.map(h => (h._1, h._2)).toSet === Set((100L, 3L), (100L, 4L)))
    assert(hits.forall(_._3 >= 0.5))
    // probe result must agree with the full batch-pairs run restricted to
    // (batch x corpus) — the incremental path is not allowed to lose pairs
    val full = Dedup.minhashLshPairs(docs.union(batch), n = 3, threshold = 0.5)
      .select($"doc1", $"doc2").as[(Long, Long)].collect()
      .filter { case (a, b) => (a >= 100L) != (b >= 100L) }
      .map { case (a, b) => if (a >= 100L) (a, b) else (b, a) }.toSet
    assert(hits.map(h => (h._1, h._2)).toSet === full)
  }

  test("simhash: exact dups at hamming 0; near-dups within budget; jaccard values match oracle op") {
    val pairs = Dedup.simhashPairs(docs, maxHamming = 12, blocks = 16)
      .select($"doc1", $"doc2", $"hamming").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Number](2).longValue)).toMap
    assert(pairs((1L, 7L)) === 0L) // identical text ⇒ identical signature
    // doc 4 = doc 3 + two appended tokens → high shingle overlap, small hamming
    assert(pairs.contains((3L, 4L)))
    // distractors (5: unrelated, 6: other language) never pair up
    assert(!pairs.keys.exists(p => Set(p._1, p._2).intersect(Set(5L, 6L)).nonEmpty))
    // (1,2) differ by 1 of 12 tokens — 3 of ~10 shingles change, which on
    // 64-bit simhash legitimately lands above hamming 12; near-dup recall
    // for that pair is the MinHash operator's job (asserted above).
  }

  test("embedding cosine near-dup within label blocks") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.99f, 0.1f, 0.0f), 0),  // near-dup of 1, same block
      (3L, Array(-1.0f, 0.0f, 0.0f), 0),  // opposite, same block
      (4L, Array(1.0f, 0.0f, 0.0f), 1))   // identical to 1 but other block
      .toDF("vec_id", "embedding", "label")
    val pairs = Dedup.embeddingCosinePairs(emb, threshold = 0.9)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("embedding cosine certificates: dense blocks cull pre-join, sparse blocks exact") {
    // block 0: 3 rows = 3 pairs > cap 2 → culled (no pair work, n_pairs 0);
    // block 1: 2 rows = 1 pair ≤ cap → exact near-dup count;
    // block 2: 2 rows, 1 candidate pair but below threshold → survives with 0
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.99f, 0.1f), 0),
      (3L, Array(1.0f, 0.01f), 0),
      (4L, Array(0.0f, 1.0f), 1), (5L, Array(0.01f, 1.0f), 1),
      (6L, Array(1.0f, 0.0f), 2), (7L, Array(-1.0f, 0.0f), 2))
      .toDF("vec_id", "embedding", "label")
    val cert = Dedup.embeddingCosineCertificates(emb, threshold = 0.9,
        maxPairsPerBlock = 2L)
      .select($"block", $"n_rows", $"culled", $"n_pairs")
      .as[(Int, Long, Boolean, Long)].collect().toSet
    assert(cert === Set((0, 3L, true, 0L), (1, 2L, false, 1L),
      (2, 2L, false, 0L)))
  }

  test("embedding cosine certificates: boundary block exactly at the budget survives") {
    // 2 rows = 1 pair, cap 1: n·(n−1) = 2 ≤ 2·cap → NOT culled (strict >)
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(1.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val cert = Dedup.embeddingCosineCertificates(emb, threshold = 0.9,
        maxPairsPerBlock = 1L)
      .select($"block", $"culled", $"n_pairs")
      .as[(Int, Boolean, Long)].collect().toSet
    assert(cert === Set((0, false, 1L)))
  }

  test("embedding cosine: zero-norm vectors drop instead of DIVIDE_BY_ZERO") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(0.0f, 0.0f), 0)) // no direction — undefined cosine
      .toDF("vec_id", "embedding", "label")
    val pairs = Dedup.embeddingCosinePairs(emb, threshold = 0.5)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L))) // ANSI mode: would throw before the guard
  }

  test("simhashCertificates: budget culls dense buckets BEFORE the join, " +
      "exact hamming pairs on survivors, output bounded by the alphabet") {
    // planted signature table: ids 1-3 share sig 0 (every block lands in
    // bucket (blk, 0)); ids 10-15 share sig -1 (bucket (blk, 255) — six
    // rows, 15 candidate pairs, OVER the cap of 10); id 20 has bits only
    // in blocks 5-6 (0x00FFFF0000000000): it joins bucket (blk, 0) for
    // the other six blocks but its hamming to sig-0 is 16 > 6, so it adds
    // a row without adding a pair — pinning that the budget counts ROWS
    // and n_pairs counts the hamming-filtered join, not the candidates.
    val sigs = Seq(
      1L -> 0L, 2L -> 0L, 3L -> 0L,
      10L -> -1L, 11L -> -1L, 12L -> -1L, 13L -> -1L, 14L -> -1L, 15L -> -1L,
      20L -> 0x00FFFF0000000000L
    ).toDF("doc_id", "sig")
    val cert = Dedup.simhashCertificates(sigs, maxHamming = 6, blocks = 8,
        maxPairsPerBucket = 10L)
      .select($"blk", $"chunk", $"n_rows", $"culled", $"n_pairs")
      .as[(Int, Long, Long, Boolean, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(cert.size === 16) // 8 blocks x 2 occupied chunk values
    for (blk <- 0 until 8) {
      if (blk == 5 || blk == 6) {
        // id 20's set bits live here: it joins (blk, 255) instead of (blk, 0)
        assert(cert((blk, 0L)) === ((3L, false, 3L)))
        assert(cert((blk, 255L)) === ((7L, true, 0L))) // 21 pairs > cap
      } else {
        assert(cert((blk, 0L)) === ((4L, false, 3L))) // 6 cands, 3 pass hamming
        assert(cert((blk, 255L)) === ((6L, true, 0L))) // 15 pairs > cap
      }
    }
  }

  test("simhashCertificates: cap wide enough serves every bucket exactly") {
    val sigs = Seq(1L -> 0L, 2L -> 0L, 3L -> 1L).toDF("doc_id", "sig")
    // sig 1 differs from sig 0 only in bit 0: hamming 1, same chunk in
    // blocks 1-7, different chunk (1 vs 0) in block 0
    val cert = Dedup.simhashCertificates(sigs, maxHamming = 6, blocks = 8,
        maxPairsPerBucket = 1000L)
      .select($"blk", $"chunk", $"n_rows", $"culled", $"n_pairs")
      .as[(Int, Long, Long, Boolean, Long)].collect()
    assert(cert.forall(!_._4)) // nothing culled
    // block 0 splits into chunks 0 (ids 1,2 -> 1 pair) and 1 (id 3 alone);
    // blocks 1-7 hold all three ids in chunk 0 -> 3 pairs each
    val m = cert.map(r => (r._1, r._2) -> (r._3, r._5)).toMap
    assert(m((0, 0L)) === ((2L, 1L)) && m((0, 1L)) === ((1L, 0L)))
    for (blk <- 1 until 8) assert(m((blk, 0L)) === ((3L, 3L)))
  }
}
