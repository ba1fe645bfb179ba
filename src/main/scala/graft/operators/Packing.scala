package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-capacity token bins in a
  * stable global order — how training pipelines batch variable-length
  * documents into constant-size context windows. This is the streaming
  * ("first-fit in arrival order") variant: a document lands in the bin
  * where its running-total start offset falls, so bins fill to ~capacity
  * with no cross-document coordination.
  *
  * Scale: the only global structure needed is the prefix sum of token
  * counts, which `Scan.cumulativeSum` computes with a range exchange + a
  * broadcast instead of a single-task window.
  */
object Packing {

  /** (doc_id, n_tokens, bin_id) for every doc, bins of `capacity` tokens
    * in `idCol` order.
    *
    * Cost note: `Scan.cumulativeSum`'s two branches each evaluate the
    * token-count projection (one regex pass per evaluation — measured
    * cheaper than persisting the (doc_id, n_tokens) pairs and carrying
    * the unpersist lifecycle; a caller looping many packings over one
    * corpus should persist `docs` once outside the loop instead).
    */
  def packSequences(docs: DataFrame, capacity: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(capacity > 0)
    val counted = docs.select(col(idCol).as("doc_id"),
      tokenCount(col(textCol)).cast("long").as("n_tokens"))
    Scan.cumulativeSum(counted, col("doc_id"), col("n_tokens"), "cum")
      .withColumn("bin_id",
        floor((col("cum") - col("n_tokens")) / lit(capacity.toDouble)).cast("long"))
      .select(col("doc_id"), col("n_tokens"), col("bin_id"))
  }
}
