package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-size token-window chunking with overlap — the context-window
  * preparation step of an LLM training/RAG pipeline (long documents are
  * cut into `chunkSize`-token windows striding by `chunkSize − overlap`,
  * so consecutive chunks share `overlap` tokens and no token is lost at a
  * boundary).
  *
  * Scale design: pure narrow codegen — `split`/`sequence`/`transform`/
  * `slice`/`posexplode` higher-order functions, zero shuffles, zero UDFs.
  * Output grows by ~n/stride per doc exactly like the downstream tokenizer
  * would see it; at 100 TB this is a map-only stage that pipelines into
  * the pack/split operators without a repartition.
  */
object Chunking {

  /** One row per (doc, chunk): `chunk_id` (0-based), `chunk_text` (the
    * window re-joined on single spaces), `n_tokens` (≤ chunkSize; the last
    * window may be short). Every doc yields ≥ 1 chunk (an empty/short doc
    * is its own chunk) so no document silently disappears.
    */
  def chunkTokens(docs: DataFrame, chunkSize: Int, overlap: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(chunkSize >= 1, "chunkSize must be >= 1")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap ($overlap) must be in [0, chunkSize)")
    val stride = chunkSize - overlap
    val toks: Column = split(col(textCol), " ")
    val n: Column = size(toks)
    // ceil((n − overlap) / stride) windows cover [0, n) with the final
    // window possibly short; clamp to ≥ 1 so empty docs keep one chunk
    val nChunks = greatest(lit(1),
      ceil((n - lit(overlap)).cast("double") / stride).cast("int"))
    docs
      .select(col(idCol), toks.as("__toks"), nChunks.as("__nc"))
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), col("__nc") - 1),
          i => slice(col("__toks"), i * stride + 1, lit(chunkSize))))
          .as(Seq("chunk_id", "__w")))
      .select(col(idCol), col("chunk_id"),
        concat_ws(" ", col("__w")).as("chunk_text"),
        size(col("__w")).as("n_tokens"))
  }
}
