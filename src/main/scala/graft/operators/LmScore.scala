package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language-model scoring — the CCNet/KenLM-style
  * "perplexity proxy" quality signal of a pre-training pipeline: documents
  * whose token transitions are improbable under the corpus's own bigram
  * statistics (boilerplate, shuffled word salad, OCR noise) score a high
  * mean negative log-likelihood and can be filtered on it.
  *
  * Model: add-one (Laplace) smoothed bigram probabilities
  * `P(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V)` trained on the scored corpus
  * itself; score = mean over a document's bigram OCCURRENCES of
  * `-ln P(w2 | w1)`. Training on the same corpus keeps the op closed under
  * the SQL oracle; scoring a held-out corpus against a trained model is the
  * same two joins with the model tables swapped in.
  *
  * Scale: the bigram exchange is the only corpus-sized shuffle (one pass,
  * map-side partial aggregation); the model tables are vocabulary-bounded
  * (`c_bg` ≤ V², `c_ctx` ≤ V) and broadcast back by default. For open-vocab
  * web text where V² outgrows executor memory, `broadcastModel = false`
  * routes the model through (w1, w2)-keyed shuffle joins instead — results
  * identical (pinned in CurationOpsSpec). The vocabulary size is a 1-row
  * broadcast attach, same pattern as TfIdf's corpus count.
  */
object LmScore {

  /** Per-document mean bigram negative log-likelihood under the corpus
    * bigram model. Documents with fewer than 2 tokens have no bigrams and
    * emit no row. Output: (doc_id, n_bigrams, lm_score), lm_score rounded
    * to 4 decimals.
    */
  def bigramLogLoss(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", broadcastModel: Boolean = true): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      tokens(col(textCol)).as("toks"))
    // One row per bigram OCCURRENCE (position order irrelevant to the mean).
    // element_at over the materialized token array — no per-element regex
    // re-evaluation (see TextFunctions.shingleHashesFromTokens).
    val bg = tok
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("toks")) - 2),
          i => struct(element_at(col("toks"), i + 1).as("w1"),
            element_at(col("toks"), i + 2).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val bgCounts = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c_bg"))
    val ctxCounts = bg.groupBy("w1").agg(count(lit(1)).as("c_ctx"))
    val vocabSize = tok
      .select(explode(col("toks")).as("w"))
      .agg(countDistinct(col("w")).as("v_size"))
    val attach = (m: DataFrame) => if (broadcastModel) broadcast(m) else m
    bg.join(attach(bgCounts), Seq("w1", "w2"))
      .join(attach(ctxCounts), Seq("w1"))
      .crossJoin(broadcast(vocabSize))
      .withColumn("nll", -log((col("c_bg") + 1).cast("double") /
        (col("c_ctx") + col("v_size"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("nll")), 4).as("lm_score"))
  }
}
