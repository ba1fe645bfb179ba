package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term scoring over a document corpus — the classic quality /
  * keyword signal for training-data curation.
  *
  * Scale: term frequencies shuffle once on (doc_id, term) with map-side
  * partial aggregation; document frequencies aggregate the same exchange
  * down to the vocabulary, which is tiny relative to the corpus, so the
  * df and corpus-size sides are broadcast back — no second full shuffle.
  * The top-k window repartitions on doc_id only.
  */
object TfIdf {

  /** Top-`k` terms per document by tf · ln(N/df), ties broken by term.
    * Ranking uses the score rounded to 6 decimals so the order is stable
    * against last-ulp libm differences (the oracle engine computes the
    * same doubles modulo 1 ulp of `ln`).
    *
    * `broadcastVocab = false` is the escape hatch for corpora whose
    * VOCABULARY outgrows executor memory (open-vocab n-grams, 100 TB web
    * text): the df side then joins via the (term)-keyed shuffle — tf is
    * already partitioned by (doc_id, term), so the extra exchange is the
    * unavoidable price of a too-big-to-broadcast dictionary. Results are
    * identical on either path (pinned in TfIdfSpec).
    */
  def topTerms(docs: DataFrame, k: Int, idCol: String = "doc_id",
      textCol: String = "text", broadcastVocab: Boolean = true): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(if (broadcastVocab) broadcast(df) else df, "term")
      .crossJoin(broadcast(total))
      .withColumn("score",
        col("tf") * log(col("n_docs").cast("double") / col("df")))
    val w = Window.partitionBy("doc_id")
      .orderBy(round(col("score"), 6).desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"),
        round(col("score"), 4).as("tfidf"), col("rank"))
  }

  /** BM25 retrieval scoring (Robertson k1/b form, Lucene idf) of a fixed
    * query-term list against the corpus, top-`k` documents returned:
    *
    *   score(q, D) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *   idf(t)      = ln(1 + (N − df + 0.5)/(df + 0.5))
    *
    * Determinism: N, df, tf, dl and Σdl are exact integers; avgdl is one
    * double division; and the per-term contributions are summed in FIXED
    * term order (a left fold over the query list, not a groupBy sum), so
    * the score is one deterministic double expression — no accumulation-
    * order noise for the oracle gate. Ties break by doc_id.
    *
    * Scale: tf shuffles once on (doc_id, term) pre-filtered to the query
    * terms (the scan's pushed `term IN (...)` makes the exchange
    * query-sized, not corpus-sized); df/N/avgdl are scalar-tiny and
    * broadcast back; top-k is TakeOrderedAndProject.
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty, "query terms must be non-empty")
    val base = docs.select(col(idCol).as("doc_id"),
      tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), explode(col("toks")).as("term"),
        size(col("toks")).cast("long").as("dl"))
    val tf = base.filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      sum(size(tokens(col(textCol))).cast("long")).as("sum_dl"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val contrib = tf.join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("contrib",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
                       (col("df") + lit(0.5))) *
          (col("tf") * (lit(k1) + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) +
            lit(b) * col("dl") / col("avgdl"))))
    // fixed-order fold: one pivoted column per query term, summed
    // left-to-right — deterministic regardless of row order
    val aggs = terms.zipWithIndex.map { case (t, i) =>
      max(when(col("term") === t, col("contrib"))).as(s"c$i") }
    val pivoted = contrib.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    val score = terms.indices.map(i => coalesce(col(s"c$i"), lit(0.0)))
      .reduce(_ + _)
    pivoted
      .select(col("doc_id"), round(score, 4).as("bm25"),
        round(score, 6).as("_ord"))
      .orderBy(col("_ord").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("bm25"))
  }

  /** Corpus vocabulary: the `maxVocab` most frequent tokens with dense
    * frequency-ranked ids (0-based; ties broken by token, so the table is
    * deterministic under any layout) — the id assignment step before
    * integer-encoding a corpus.
    *
    * Scale: token counts shuffle once with map-side partial aggregation;
    * the top-`maxVocab` cut is TakeOrderedAndProject (per-partition heaps,
    * never a global sort of the full vocabulary), and only the ≤ maxVocab
    * surviving rows pass through the id-assigning window — the same
    * bounded-by-construction pattern as the broadcast df above.
    */
  def vocabulary(docs: DataFrame, maxVocab: Int,
      textCol: String = "text"): DataFrame = {
    require(maxVocab >= 1, "maxVocab must be >= 1")
    val counts = docs
      .select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(maxVocab)
    val w = Window.orderBy(col("n").desc, col("token").asc)
    counts.withColumn("token_id", row_number().over(w).cast("long") - 1)
  }

  /** Per-document out-of-vocabulary ratio against the corpus's own
    * top-`maxVocab` vocabulary — the tokenizer-coverage filter of a
    * training pipeline (documents whose token mass falls mostly outside
    * the model vocabulary train badly and are cut or routed to a byte-
    * level fallback). Counts token OCCURRENCES, not types: a doc spamming
    * one rare token is as OOV-heavy as one using many.
    *
    * Scale: the vocabulary is ≤ maxVocab rows by construction, so the
    * membership probe is a broadcast left join on the exploded token
    * stream — one corpus-sized exchange for the per-doc aggregate, and
    * the vocabulary pipeline's own bounded shape (see `vocabulary`).
    */
  def oovStats(docs: DataFrame, maxVocab: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val vocab = vocabulary(docs, maxVocab, textCol)
      .select(col("token").as("w"), lit(true).as("in_vocab"))
    docs.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("w"))
      .join(broadcast(vocab), Seq("w"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("in_vocab").isNull, 1)).as("n_oov"))
      .withColumn("oov_ratio",
        round(col("n_oov") * 1.0 / col("n_tokens"), 4))
  }
}
