package graft

import graft.operators.{Privacy, Profile, Repetition}
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
}
