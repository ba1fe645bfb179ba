package graft

import graft.operators.Fuzzy
import org.apache.spark.sql.functions._

class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("pairs within maxDist found; beyond maxDist excluded") {
    val d = docs(              // all exactly 16 chars = the signature
      1L -> "hello world alp1",
      2L -> "hello world alp2",   // 1 edit from doc 1
      3L -> "hello wXrld aXp3",   // 3 edits from doc 1 and from doc 2
      4L -> "hellZ ZZZZZZZZZZ",   // same block, >3 edits from all
      5L -> "zzzz completely different")
    val out = Fuzzy.editDistancePairs(d, "doc_id", "text",
        sigLen = 16, blockLen = 4, maxDist = 3, maxBlock = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out.contains((1L, 2L, 1)))
    assert(out.contains((1L, 3L, 3)))
    assert(out.contains((2L, 3L, 3)))
    assert(!out.exists(p => p._1 == 4L || p._2 == 4L),
      "4 edits must not survive maxDist=3")
    assert(!out.exists(p => p._1 == 5L || p._2 == 5L),
      "different block prefix must never pair")
  }

  test("banded threshold DP agrees with the full DP on every admitted pair") {
    // The engine filters with levenshtein(l, r, threshold) (banded,
    // -1 sentinel); the oracle uses the full DP. On every pair the
    // banded form ADMITS, the two must be equal — this is the law that
    // makes the DuckDB oracle sound.
    val d = docs(
      10L -> "abcdefghijklmnop",
      11L -> "abcdXfghijklmnop",
      12L -> "abcdXfghXjklmnXp",
      13L -> "abcdefghijklm",     // length-band edge: 3 shorter
      14L -> "abcd")              // far outside the length band
    val out = Fuzzy.editDistancePairs(d, "doc_id", "text",
        sigLen = 16, blockLen = 4, maxDist = 3, maxBlock = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // recompute each admitted pair with the un-thresholded function
    val sigs = Map(10L -> "abcdefghijklmnop", 11L -> "abcdXfghijklmnop",
      12L -> "abcdXfghXjklmnXp", 13L -> "abcdefghijklm", 14L -> "abcd")
    out.foreach { case ((a, b), dist) =>
      val full = Seq((sigs(a), sigs(b))).toDF("l", "r")
        .select(levenshtein(col("l"), col("r"))).head().getInt(0)
      assert(dist === full, s"banded DP disagrees with full DP on ($a,$b)")
    }
    assert(out.contains((10L, 13L)), "3-char length gap is inside the band")
    assert(!out.exists(p => p._1._1 == 14L || p._1._2 == 14L),
      "12-char length gap must be culled by the length band")
  }

  test("segment-pigeonhole path ≡ direct pair join on a randomized " +
      "oversized block (lossless sub-split, r11 under-cap band fix)") {
    // one hot block (shared 4-prefix) big enough to cross splitAt, with
    // seeded random suffixes plus planted near-duplicates at every edit
    // distance 0..4, mixed lengths (truncated suffixes take the
    // short×block path), plus a second small block for the direct path
    val rnd = new scala.util.Random(42)
    val alpha = "abcdez "
    def randSuf(n: Int) =
      (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val hot = (1L to 300L).map(i => i -> ("blk!" + randSuf(12)))
    val planted = Seq(
      1001L -> "blk!aaabbbcccddd", 1002L -> "blk!aaabbbcccddd", // dist 0
      1003L -> "blk!aaabbbcccddX",                              // dist 1
      1004L -> "blk!aaabbXcccdXd",                              // dist 2-3
      1005L -> "blk!Xaabbbcccd",   // shorter: length band edge
      1006L -> "blk!ab")           // far shorter: culled by band
    val cold = Seq(2001L -> "cold suffix here", 2002L -> "cold suffix hXre")
    val corpus = docs((hot ++ planted ++ cold): _*)
    def run(splitAt: Int) = Fuzzy.editDistancePairs(corpus, "doc_id",
        "text", sigLen = 16, blockLen = 4, maxDist = 3, maxBlock = 10000,
        splitAt = splitAt)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val direct = run(splitAt = 100000) // everything on the quadratic path
    val split = run(splitAt = 16)      // hot block on the segment path
    assert(split === direct,
      s"segment path diverged: missing=${direct -- split} " +
        s"extra=${split -- direct}")
    assert(direct.contains((1001L, 1002L, 0)))
    assert(direct.contains((1001L, 1003L, 1)))
    assert(direct.exists(p => p._1 == 1001L && p._2 == 1004L))
    assert(!direct.exists(p => p._1 == 1006L || p._2 == 1006L),
      "10-char length gap must be culled by the length band")
    assert(direct.contains((2001L, 2002L, 1)), "small block keeps working")
  }

  test("suffix too short for the pigeonhole keeps the direct path " +
      "(no failure on degenerate configs)") {
    // sigLen − blockLen = 2 < maxDist + 1 = 4: segments impossible; the
    // oversized block must fall back to the direct pair join, not throw
    val d = docs((1L to 40L).map(i => i -> s"abcdX$i") :+
      (100L -> "abcdZZ"): _*)
    val out = Fuzzy.editDistancePairs(d, "doc_id", "text",
        sigLen = 6, blockLen = 4, maxDist = 3, maxBlock = 1000,
        splitAt = 8)
      .collect()
    assert(out.nonEmpty, "degenerate config must still produce pairs")
  }

  test("oversized blocks are dropped whole (df-cap discipline)") {
    val flood = (100L to 120L).map(i => i -> s"same prefix here $i")
    val pair = Seq(900L -> "rare block alpha", 901L -> "rare block alphX")
    val out = Fuzzy.editDistancePairs(docs((flood ++ pair): _*),
        "doc_id", "text", sigLen = 16, blockLen = 4, maxDist = 3,
        maxBlock = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((900L, 901L)),
      "the 21-member block exceeds maxBlock=10 and must vanish whole")
  }
}
