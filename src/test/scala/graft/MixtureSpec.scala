package graft

import graft.operators.Mixture
import org.apache.spark.sql.functions._

/** Token-budget source mixing: budget semantics (spend until cum-before
  * crosses, ≤ 1 doc overshoot), exclusion of unbudgeted sources, and
  * layout-independence of the md5 selection order.
  */
class MixtureSpec extends SparkSpec {
  import spark.implicits._

  // ten 5-token docs per source → n_tokens = 5 each, deterministic
  private def corpus = (for {
    (src, base) <- Seq(("a", 0L), ("b", 100L), ("c", 200L))
    i <- 0L until 10L
  } yield (base + i, src, "one two three four five")).toDF("doc_id", "source", "text")

  test("budget spends until crossed; one-doc overshoot; unbudgeted excluded") {
    val got = Mixture.tokenBudgetMix(corpus,
      budgets = Map("a" -> 12L, "b" -> 1000L))
    val bySrc = got.groupBy("source")
      .agg(count(lit(1)).as("n"), sum("n_tokens").as("toks"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // a: cum_before 0,5,10 < 12 → 3 docs (15 tokens, overshoot 3 ≤ one doc)
    assert(bySrc("a") === ((3L, 15L)))
    // b: budget exceeds the source → everything taken
    assert(bySrc("b") === ((10L, 50L)))
    // c: no budget → excluded
    assert(!bySrc.contains("c"))
  }

  test("zero budget takes nothing; empty budget map takes nothing") {
    assert(Mixture.tokenBudgetMix(corpus, Map("a" -> 0L)).count() === 0L)
    assert(Mixture.tokenBudgetMix(corpus, Map.empty).count() === 0L)
  }

  test("selection is independent of partition layout") {
    val budgets = Map("a" -> 12L, "b" -> 22L, "c" -> 7L)
    val one = Mixture.tokenBudgetMix(corpus.coalesce(1), budgets)
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    val many = Mixture.tokenBudgetMix(corpus.repartition(13), budgets)
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(one === many)
    assert(one.nonEmpty)
  }
}
