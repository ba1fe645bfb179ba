package graft

import graft.operators.{Dedup, Export, LmScore, Privacy, Profile, Repetition, TfIdf}
import org.apache.spark.sql.functions._

/** Planted-fixture checks for the round-2 curation additions: repetition
  * stats, k-anonymity gate, single-pass profiler.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("Repetition.bigramStats: loops score low-distinct, clean text scores high") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),         // 5 bigrams, 1 distinct
      (2L, "all unique words appear exactly once"),  // 5 bigrams, 5 distinct
      (3L, "one"),                                   // < 2 tokens → no row
      (4L, "ab ab ab cd")                            // 3 bigrams: ab-ab ×2, ab-cd
    ).toDF("doc_id", "text")
    val got = Repetition.bigramStats(docs).orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq === Seq(
      (1L, 5L, 1L, 0.2, 1.0),
      (2L, 5L, 5L, 1.0, 0.2),
      (4L, 3L, 2L, 0.6667, 0.6667)))
  }

  test("Privacy.kAnonymous keeps frequent keys, inverse extracts the suppressed slice") {
    val rows = (Seq.fill(5)("alice") ++ Seq.fill(2)("bob") ++ Seq("carol"))
      .zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("id", "user")
    val kept = Privacy.kAnonymous(rows, col("user"), k = 3)
      .select("user").distinct().as[String].collect().toSet
    assert(kept === Set("alice"))
    val suppressed = Privacy.kAnonymous(rows, col("user"), k = 3, keep = false)
      .select("user").distinct().as[String].collect().toSet
    assert(suppressed === Set("bob", "carol"))
  }

  test("Privacy.kAnonymous: NULL is a key — null rows partition like any other") {
    val rows = Seq((1L, Some("a")), (2L, Some("a")), (3L, Some("a")),
      (4L, None), (5L, None), (6L, Some("b")))
      .toDF("id", "user")
    val kept = Privacy.kAnonymous(rows, col("user"), k = 2)
      .select("id").as[Long].collect().toSet
    val supp = Privacy.kAnonymous(rows, col("user"), k = 2, keep = false)
      .select("id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L, 4L, 5L)) // the two null-key rows qualify
    assert(supp === Set(6L))
    assert(kept ++ supp === (1L to 6L).toSet) // nothing vanishes
  }

  test("Profile.tableProfile: one row per column with exact stats") {
    val df = Seq(
      (1L, Some("a"), 1.5),
      (2L, None, 1.5),
      (3L, Some("c"), 9.0)
    ).toDF("id", "s", "v")
    val got = Profile.tableProfile(df, Seq("id", "s", "v"))
      .orderBy($"column_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    assert(got.toSeq === Seq(
      ("id", 3L, 0L, 3L, "1", "3"),
      ("s", 3L, 1L, 2L, "a", "c"),
      ("v", 3L, 0L, 2L, "1.5", "9.0")))
  }

  test("LmScore.bigramLogLoss: hand-computed Laplace bigram NLL") {
    // corpus: c(a b)=3, c(b a)=1, c(b c)=1; c_ctx(a)=3, c_ctx(b)=2; V=3
    // P(b|a)=(3+1)/(3+3)=2/3, P(a|b)=P(c|b)=(1+1)/(2+3)=2/5
    val docs = Seq(
      (1L, "a b a b"), // bigrams ab, ba, ab → mean(-ln 2/3, -ln 2/5, -ln 2/3)
      (2L, "a b c"),   // ab, bc → mean(-ln 2/3, -ln 2/5)
      (3L, "a")        // < 2 tokens → no row
    ).toDF("doc_id", "text")
    val got = LmScore.bigramLogLoss(docs).orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, 3L, 0.5757), (2L, 2L, 0.6609)))
  }

  test("LmScore: shuffle-join model path matches the broadcast path") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown cat sleeps under the warm sun"),
      (3L, "pack my box with five dozen liquor jugs today")
    ).toDF("doc_id", "text")
    val a = LmScore.bigramLogLoss(docs).orderBy($"doc_id").collect().toSeq
    val b = LmScore.bigramLogLoss(docs, broadcastModel = false)
      .orderBy($"doc_id").collect().toSeq
    assert(a === b)
  }

  test("Dedup.dupWindowStats: occurrence-level shared-window counts") {
    val docs = Seq(
      (1L, "x y z w q"),       // windows: xyz, yzw, zwq — all shared with 5
      (2L, "a b x y z"),       // abx, bxy, xyz — one shared
      (3L, "p q r"),           // exactly n tokens → 1 unique window
      (4L, "m n"),             // < n tokens → full text is the window
      (5L, "x y z w q"),       // exact dup of 1
      (6L, "x y z x y z")      // xyz, yzx, zxy, xyz — xyz TWICE, both count
    ).toDF("doc_id", "text")
    val got = Dedup.dupWindowStats(docs, n = 3).orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      (1L, 3L, 3L, 1.0),
      (2L, 3L, 1L, 0.3333),
      (3L, 1L, 0L, 0.0),
      (4L, 1L, 0L, 0.0),
      (5L, 3L, 3L, 1.0),
      (6L, 4L, 2L, 0.5)))
  }

  test("Dedup.dupSpanMerge: maximal spans, touching-window merge, tail clamp, minSpan cut") {
    val docs = Seq(
      (1L, "p1 p2 a b c d e q1 q2"), // shares a..e with doc 2 → one 5-token span mid-doc
      (2L, "r1 a b c d e r2"),       // same span at a different offset
      (3L, "a b c d e f"),           // dup windows 0..3 chain across the whole doc
      (4L, "z1 z2 z3 d e f"),        // lone dup window → exactly n tokens
      (5L, "a b c y1 y2 y3 d e f"),  // two shared substrings 6 apart: distance > n stays TWO spans
      (6L, "m n"), (7L, "m n"),      // short-doc dup: tail clamp makes it 2 tokens → under minSpan, absent
      (8L, "d e f a b c")            // shared windows at distance EXACTLY n (ranges touch) → one merged span
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpanMerge(docs, n = 3, minSpan = 3)
      .orderBy($"doc_id", $"span_start")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(got.toSeq === Seq(
      (1L, 2, 6, 5),
      (2L, 1, 5, 5),
      (3L, 0, 5, 6),
      (4L, 3, 5, 3),
      (5L, 0, 2, 3), (5L, 6, 8, 3),
      (8L, 0, 5, 6)))
  }

  test("Dedup.exciseDupSpans: cuts exactly the span tokens, keeps order, drops emptied docs") {
    val docs = Seq(
      (1L, "p1 p2 a b c d e q1 q2"), // span [2,6] → keeps p1 p2 q1 q2
      (2L, "r1 a b c d e r2"),       // span [1,5] → keeps r1 r2
      (3L, "a b c d e f"),           // abc/bcd/cde shared (def is not in
                                     // THIS doc set) → span [0,4], "f" kept
      (4L, "a b c x1 a b c"),        // same window twice + a3-span overlap:
                                     // spans [0,2] and [4,6] → keeps x1
      (5L, "u1 u2 u3 u4")            // no spans → passes through verbatim
    ).toDF("doc_id", "text")
    val got = Dedup.exciseDupSpans(docs, n = 3, minSpan = 3)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (1L, "p1 p2 q1 q2", 4L),
      (2L, "r1 r2", 2L),
      (3L, "f", 1L),
      (4L, "x1", 1L),
      (5L, "u1 u2 u3 u4", 4L)))
  }

  test("Export.shardId is layout-independent and writeShards round-trips") {
    val docs = (0L until 100L).map(i => (i, s"doc number $i payload"))
      .toDF("doc_id", "text")
    // pure function of the key: same assignment at any partition count
    val a1 = Export.withShard(docs, $"doc_id", 16)
      .select("doc_id", "shard_id").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a2 = Export.withShard(docs.repartition(7), $"doc_id", 16)
      .select("doc_id", "shard_id").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a1 === a2)
    assert(a1.values.toSet.subsetOf((0 until 16).toSet))

    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    try {
      Export.writeShards(docs, $"doc_id", nShards = 16, out, maxRecordsPerFile = 4)
      // hive layout: one dir per non-empty shard, matching the assignment
      val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
        .map(_.getName).filter(_.startsWith("shard_id=")).toSet
      assert(dirs === a1.values.toSet.map((s: Int) => s"shard_id=$s"))
      // round trip: content identical, shard column restored from the path
      val back = spark.read.parquet(out)
      assert(back.count() === 100)
      val got = back.select("doc_id", "shard_id")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got === a1)
      // per-file contract: ≤ maxRecordsPerFile rows, sorted by key
      val files = new java.io.File(out).listFiles().filter(_.isDirectory)
        .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
      assert(files.nonEmpty)
      files.foreach { f =>
        val ids = spark.read.parquet(f.getAbsolutePath)
          .select("doc_id").collect().map(_.getLong(0)).toSeq
        assert(ids.length <= 4, s"${f.getName}: ${ids.length} rows > cap")
        assert(ids === ids.sorted, s"${f.getName} not key-sorted")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("Export.trainingOrder: epoch-stable membership, contiguous positions, seed reshuffles") {
    val docs = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    def order(seed: String) =
      Export.trainingOrder(docs, $"doc_id", nShards = 8, seed = seed)
        .select("doc_id", "shard_id", "pos").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val ep1 = order("ep1")
    val ep2 = order("ep2")
    // shard membership is the UNSEEDED assignment — identical across epochs
    assert(ep1.map(t => t._1 -> t._2).toMap === ep2.map(t => t._1 -> t._2).toMap)
    // positions are contiguous 1..n within every shard (loader-resumable)
    ep1.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq,
        s"shard $shard positions not contiguous")
    }
    // a new seed is a genuine reshuffle: some doc moves position
    assert(ep1.map(t => t._1 -> t._3).toMap !== ep2.map(t => t._1 -> t._3).toMap)
    // deterministic: same seed, different layout, identical order
    val ep1b = Export.trainingOrder(docs.repartition(7), $"doc_id", 8, "ep1")
      .select("doc_id", "shard_id", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(ep1.sortBy(_._1).toSeq === ep1b.sortBy(_._1).toSeq)
  }

  test("TfIdf.oovStats: occurrence-counted OOV against the vocab cut") {
    // counts: a=3, b=2, c=2 → top-2 is {a, b} (tie b/c broken by token)
    val docs = Seq(
      (1L, "a a b"),
      (2L, "a b c c")
    ).toDF("doc_id", "text")
    val got = TfIdf.oovStats(docs, maxVocab = 2).orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq((1L, 3L, 0L, 0.0), (2L, 4L, 2L, 0.5)))
  }
}
