package graft

import graft.operators.{Chunking, Incremental}
import org.apache.spark.sql.functions._

class ChunkingIncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def chunks(text: String, size: Int, ov: Int) =
    Chunking.chunkTokens(Seq((1L, text)).toDF("doc_id", "text"), size, ov)
      .select($"chunk_id", $"chunk_text", $"n_tokens")
      .as[(Int, String, Int)].collect().toSeq.sortBy(_._1)

  test("chunking: stride covers every token, last window short, overlap shared") {
    val got = chunks("a b c d e f g h i j k", size = 4, ov = 1)
    // stride 3, 11 tokens: [a..d], [d..g], [g..j], [j k] — short tail kept
    assert(got === Seq(
      (0, "a b c d", 4), (1, "d e f g", 4), (2, "g h i j", 4), (3, "j k", 2)))
    // every consecutive pair shares exactly `overlap` tokens
    got.sliding(2).foreach { case Seq((_, t1, _), (_, t2, _)) =>
      assert(t1.split(" ").takeRight(1).toSeq === t2.split(" ").take(1).toSeq)
    case _ => ()
    }
  }

  test("chunking: exact multiple leaves no empty tail window") {
    // 7 tokens, size 4, stride 3 → ceil((7-1)/3) = 2 windows, not 3
    assert(chunks("a b c d e f g", 4, 1) ===
      Seq((0, "a b c d", 4), (1, "d e f g", 4)))
  }

  test("chunking: doc shorter than overlap still yields one chunk") {
    assert(chunks("a", 16, 4) === Seq((0, "a", 1)))
  }

  test("chunking: zero overlap partitions exactly") {
    assert(chunks("a b c d e f", 3, 0) ===
      Seq((0, "a b c", 3), (1, "d e f", 3)))
  }

  test("incremental delta apply: inserts, deletes, updates, vanished group") {
    val gold = Seq(("x", 2L, 30.0), ("y", 1L, 5.0)).toDF("g", "n", "s")
    // CDF: insert into new group z; delete BOTH x rows (group vanishes);
    // update the y row 5.0 → 8.0
    val cdf = Seq(
      ("z", 7.0, "insert"),
      ("x", 10.0, "delete"), ("x", 20.0, "delete"),
      ("y", 5.0, "update_preimage"), ("y", 8.0, "update_postimage"))
      .toDF("g", "v", "_change_type")
    val got = Incremental.applyCountSumDelta(gold, cdf, Seq("g"),
        "n", "s", "v")
      .as[(String, Long, Double)].collect().toSet
    assert(got === Set(("y", 1L, 8.0), ("z", 1L, 7.0))) // x dropped at n=0
  }

  test("incremental delta apply equals full recompute on a random churn") {
    val rnd = new scala.util.Random(17)
    val base = (1L to 300L).map(k => (k, s"g${k % 7}", rnd.nextInt(100).toDouble))
    val after = base.filter(_._1 % 3 != 0) ++ // delete a third
      base.filter(_._1 % 5 == 0).map { case (k, g, v) => (k + 1000, g, v + 1) } ++ // inserts
      Seq() // updates via overlap below
    val bdf = base.toDF("k", "g", "v")
    val adf = after.map { case (k, g, v) =>
      if (k % 7 == 1) (k, g, v * 2) else (k, g, v) // some updates
    }.toDF("k", "g", "v")
    val cat = new graft.catalog.TableCatalog(spark, tmpDir("ivm"))
    cat.overwrite(bdf, "s", "t"); cat.overwrite(adf, "s", "t")
    val cdf = cat.changesByKey("s", "t", Seq("k"), 1, 2)
    val gold1 = bdf.groupBy($"g").agg(count(lit(1)).as("n"), sum($"v").as("s"))
    val got = Incremental.applyCountSumDelta(gold1, cdf, Seq("g"), "n", "s", "v")
      .select($"g", $"n", round($"s", 6).as("s"))
      .as[(String, Long, Double)].collect().toSet
    val want = adf.groupBy($"g").agg(count(lit(1)).as("n"),
        round(sum($"v"), 6).as("s"))
      .as[(String, Long, Double)].collect().toSet
    assert(got === want)
  }
}
