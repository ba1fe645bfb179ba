package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance fuzzy join — approximate string matching between bounded
  * signatures, the record-linkage primitive the token/shingle dedup family
  * (n-gram Jaccard, MinHash, SimHash) cannot express: those measure SET
  * overlap and are blind to character-level typos that preserve few
  * shingles, while Levenshtein counts the actual edits.
  *
  * Scale shape (the all-pairs DP is O(n²·k·L) and never acceptable):
  *   1. signature = first `sigLen` chars, lowercased — the DP cost is
  *      capped at L=sigLen regardless of document length;
  *   2. prefix blocking — candidates must share the first `blockLen`
  *      chars. Sound for pairs whose edits all fall past the block prefix
  *      (the standard blocking trade-off, stated, not hidden: an edit
  *      inside the first `blockLen` chars escapes the join, exactly like
  *      an LSH band miss);
  *   3. oversized blocks (> `maxBlock` members) are dropped whole before
  *      the pair join — the df-cap discipline shared with
  *      `Dedup.ngramPairsCapped`, bounding worst-case fan-out at
  *      maxBlock²/2 per block instead of corpus²;
  *   4. a length-band prefilter (|len(a)−len(b)| ≤ maxDist is a lower
  *      bound on edit distance) culls pairs before any DP runs;
  *   5. the DP itself is Spark's codegen `levenshtein(l, r, threshold)` —
  *      the banded variant that walks only the 2·maxDist+1 diagonal and
  *      early-exits to −1, O(maxDist·L) per pair, not O(L²).
  *
  * The pair join is hash equi on the block key; no cross product exists
  * anywhere in the plan.
  */
object Fuzzy {

  /** Unordered candidate pairs (doc1 < doc2) whose signatures sit within
    * `maxDist` edits. Columns: doc1, doc2, dist.
    */
  def editDistancePairs(docs: DataFrame, idCol: String, textCol: String,
      sigLen: Int = 16, blockLen: Int = 4, maxDist: Int = 3,
      maxBlock: Int = 10000): DataFrame = {
    require(blockLen < sigLen, "block prefix must be shorter than the signature")
    val sig = docs.select(col(idCol).cast("long").as("doc_id"),
        substring(lower(col(textCol)), 1, sigLen).as("sig"))
      .withColumn("b", substring(col("sig"), 1, blockLen))
    val ok = sig.groupBy(col("b"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") <= maxBlock)
      .select(col("b"))
    val blocked = sig.join(ok, Seq("b"))
    val left = blocked.select(col("b"), col("doc_id").as("doc1"),
      col("sig").as("sig1"))
    val right = blocked.select(col("b"), col("doc_id").as("doc2"),
      col("sig").as("sig2"))
    left.join(right, Seq("b"))
      .filter(col("doc1") < col("doc2"))
      .filter(abs(length(col("sig1")) - length(col("sig2"))) <= maxDist)
      .withColumn("dist", levenshtein(col("sig1"), col("sig2"), maxDist))
      .filter(col("dist") =!= -1)
      .select(col("doc1"), col("doc2"), col("dist"))
  }
}
