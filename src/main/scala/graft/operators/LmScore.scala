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
  * Scale: ONE corpus-sized exchange — the bigram stream is hash-partitioned
  * on (w1, w2) and that exchange is REUSED (Catalyst `ReuseExchange`) as
  * both the model-build input (`groupBy(w1, w2)` plans with no further
  * shuffle on an already-(w1,w2)-partitioned child) and the probe side of
  * the bigram-count join (both sides carry `HashPartitioning(w1, w2)`, so
  * the join adds only sorts). The context table derives from the bigram
  * counts (V² → V rows, a tiny second-order aggregate) and is broadcast by
  * default; `broadcastModel = false` routes it through a w1-keyed shuffle
  * join for open-vocab web text where even V outgrows executor memory —
  * results identical (pinned in CurationOpsSpec). The vocabulary size is a
  * 1-row broadcast attach, same pattern as TfIdf's corpus count.
  *
  * Earlier rounds broadcast the FULL V²-bounded bigram table; at bench
  * scale that meant a multi-MB driver-side collect + hash-relation build
  * whose cost is invisible on a quiet box but stalls for seconds under the
  * heap/GC pressure of a 179-query shared-JVM inventory run (the r8
  * `text_lm_score` 6.3× driver-bench anomaly). The co-partitioned join
  * reuses a shuffle the plan needs anyway and never ships the model
  * through the driver.
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
    // arrays_zip of the two shifted slices, NOT a transform(sequence(...))
    // lambda: higher-order-function lambda variables defeat plan
    // canonicalization, so the three consumers of the repartitioned bigram
    // stream each got their own exchange (no ReuseExchange / AQE stage
    // reuse). The lambda-free form canonicalizes, and the corpus pipeline
    // runs once.
    val bg = tok
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        explode(arrays_zip(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1))).as("b"))
      .select(col("doc_id"), col("b.0").as("w1"), col("b.1").as("w2"))
    // The one corpus-sized exchange, shared by the model build AND the
    // probe join below. ReuseExchange alone cannot dedupe it: column
    // pruning strips doc_id from the model-build branches, so the three
    // exchanges stop being canonically identical and each recomputed the
    // scan+tokenize+explode pipeline. The lazy localCheckpoint pins the
    // repartitioned bigram stream after its first computation (the repo's
    // standard shared-scan idiom — Dedup's rare index, Clusters' edge
    // list), and LogicalRDD preserves the (w1, w2) hash partitioning, so
    // the groupBy plans with no further exchange and the probe join adds
    // only sorts.
    val bgP = bg.repartition(col("w1"), col("w2"))
      .localCheckpoint(eager = false)
    val bgCounts = bgP.groupBy("w1", "w2").agg(count(lit(1)).as("c_bg"))
    // c(w1) = Σ_w2 c(w1, w2): second-order aggregate over the V²-bounded
    // model table, NOT another pass over the corpus.
    val ctxCounts = bgCounts.groupBy("w1").agg(sum(col("c_bg")).as("c_ctx"))
    val vocabSize = tok
      .select(explode(col("toks")).as("w"))
      .agg(countDistinct(col("w")).as("v_size"))
    val attach = (m: DataFrame) => if (broadcastModel) broadcast(m) else m
    bgP.join(bgCounts, Seq("w1", "w2")) // co-partitioned, exchange reused
      .join(attach(ctxCounts), Seq("w1"))
      .crossJoin(broadcast(vocabSize))
      .withColumn("nll", -log((col("c_bg") + 1).cast("double") /
        (col("c_ctx") + col("v_size"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("nll")), 4).as("lm_score"))
  }
}
