package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic source mixing to per-domain token budgets — the "data
  * mixture" step of a pre-training pipeline: given target token counts per
  * source/domain, select documents until each source's budget is spent.
  *
  * Selection order within a source is md5(doc_id): engine- and
  * partition-layout-independent (the same auditable-hash trick as
  * Sampling.hashBernoulli), so the mix is reproducible anywhere and
  * "take the first k tokens" is an unbiased sample of the source. A doc is
  * taken while the tokens consumed BEFORE it are under budget — so the
  * budget is always met (never undershot) when the source has enough
  * tokens, overshooting by at most one document.
  *
  * Scale: one window per source = a per-source sort. Fine for the usual
  * 10-100 domain mixes (each source sorts independently in parallel); for
  * a single source so large its sort hurts, the hash ordering admits a
  * sort-free two-pass variant — estimate tokens-per-hash-prefix quantiles,
  * then filter `md5(id) < threshold` (Bernoulli with a budget-derived
  * rate) — at the cost of approximate budget landing.
  */
object Mixture {

  /** (doc_id, source, n_tokens) of the selected mix. Sources absent from
    * `budgets` are excluded (budget 0).
    */
  def tokenBudgetMix(docs: DataFrame, budgets: Map[String, Long],
      sourceCol: String = "source", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(budgets.values.forall(_ >= 0), "budgets must be non-negative")
    val counted = docs.select(col(sourceCol).as("source"),
      col(idCol).as("doc_id"),
      tokenCount(col(textCol)).cast("long").as("n_tokens"))
    val budget = budgets.foldLeft(lit(0L)) { case (acc, (s, b)) =>
      when(col("source") === s, lit(b)).otherwise(acc)
    }
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    counted
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .filter(col("cum_before") < budget)
      .select(col("doc_id"), col("source"), col("n_tokens"))
  }
}
