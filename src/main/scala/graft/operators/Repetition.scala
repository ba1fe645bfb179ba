package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Within-document repetition signals — the Gopher/MassiveText-family
  * quality filters that catch boilerplate, keyword stuffing, and generation
  * loops: a document whose token bigrams are mostly copies of each other is
  * template noise regardless of its length or language.
  *
  * Emitted per doc (docs with ≥ 2 tokens; shorter ones have no bigram
  * signal): total/distinct bigram counts, the top bigram's share, and the
  * distinct fraction. Downstream filters threshold these (e.g. keep
  * `distinct_frac ≥ 0.2 AND top_frac ≤ 0.18`).
  *
  * Scale: bigrams aggregate per (doc, bigram) with map-side partial
  * aggregation, then collapse per doc — two key-local shuffles of
  * bigram-count rows, nothing quadratic, no UDFs (pure
  * `transform`/`concat` codegen).
  */
object Repetition {

  def bigramStats(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val bg = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i + 1]))"
      )).as("b"))
    bg.groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_bigrams"),
           count(lit(1)).as("n_distinct"),
           max(col("n")).as("top_n"))
      .select(col("doc_id"), col("n_bigrams"), col("n_distinct"),
        round(col("n_distinct") / col("n_bigrams"), 4).as("distinct_frac"),
        round(col("top_n") / col("n_bigrams"), 4).as("top_frac"))
  }
}
