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
    // direction: the smaller-set side is always reported as contained
    val rows = cont.select("contained", "container").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
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
}
