package graft.operators

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication family for training-data pipelines — the
  * north-star extension ops (BASELINE.json): exact, n-gram Jaccard,
  * MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale design (100 TB): nothing here ever materializes the O(n²) pair
  * space. Exact dedup is a hash groupBy; near-dup candidates come from an
  * inverted index (shingle join) or LSH banding, both of which shuffle on
  * content-derived keys and only pair up documents sharing a bucket. Skewed
  * buckets (stop-shingles shared by everything) are the classic hazard —
  * `maxBucket` caps them, trading bounded recall loss for a hard upper
  * bound on join fan-out.
  */
object Dedup {

  /** Exact dedup: group by normalized-content fingerprint, keep the lowest
    * doc id per group. One shuffle on the hash — embarrassingly scalable.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .withColumn("fingerprint", md5Fingerprint(col(textCol)))
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact n-gram (shingle) Jaccard near-dup pairs via inverted index:
    * explode distinct shingles, self-join on shingle (doc1 < doc2), count
    * the intersection, derive |union| from per-doc shingle counts. Only
    * documents sharing at least one shingle ever meet, so the join output
    * is proportional to true overlap, not n².
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = docs.select(
      col(idCol).as("doc_id"),
      distinctShingles(col(textCol), n).as("ss"))
      .withColumn("ns", size(col("ss")))
    val ex = sh.select(col("doc_id"), col("ns"), explode(col("ss")).as("s"))
    val a = ex.as("a")
    val b = ex.as("b")
    a.join(b, col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"),
               col("a.ns").as("n1"), col("b.ns").as("n2"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("n1") + col("n2") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc1"), col("doc2"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** MinHash signature column: `numHashes` permutations simulated with
    * seeded xxhash64 over the distinct shingles; each signature slot is the
    * min hash under that seed. Computed entirely inside codegen (aggregate
    * HOF per slot) — no UDF, no driver state.
    */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      aggregate(shingleArr, lit(Long.MaxValue),
        (acc, s) => least(acc, xxhash64(lit(i), s)))
    }: _*)

  /** MinHash + LSH banding near-dup pairs, verified against exact Jaccard.
    *
    * bands × rowsPerBand = numHashes. Two docs land in the same bucket when
    * one band of their signatures agrees — P(candidate) = 1-(1-J^r)^b, the
    * standard S-curve. Candidates are then EXACT-verified (shingle-set
    * Jaccard) so emitted pairs have no false positives; recall is the only
    * approximation, and the spec test pins it = 1.0 on the planted corpus.
    *
    * Scale: the only shuffles are (band, bucketHash) groupBy and the final
    * verify join; `maxBucket` drops degenerate buckets to bound fan-out.
    */
  def minhashLshPairs(docs: DataFrame, n: Int, threshold: Double,
      bands: Int = 16, rowsPerBand: Int = 4, maxBucket: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sh = docs.select(
      col(idCol).as("doc_id"),
      distinctShingles(col(textCol), n).as("ss"))
    val sig = sh.withColumn("sig", minhashSignature(col("ss"), numHashes))

    // band → bucket hash (hash of that band's signature slice)
    val banded = sig.select(
      col("doc_id"), col("ss"),
      explode(array((0 until bands).map { bnd =>
        struct(lit(bnd).as("band"),
               xxhash64(slice(col("sig"), bnd * rowsPerBand + 1, rowsPerBand))
                 .as("bucket"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("ss"), col("bb.band"), col("bb.bucket"))

    val candidates = banded.groupBy(col("band"), col("bucket"))
      .agg(collect_list(struct(col("doc_id"), col("ss"))).as("members"))
      .filter(size(col("members")).between(2, maxBucket))
      .select(explode(expr(
        """filter(
             flatten(transform(members, a ->
               transform(members, b -> struct(a.doc_id AS doc1, a.ss AS ss1,
                                              b.doc_id AS doc2, b.ss AS ss2)))),
             p -> p.doc1 < p.doc2)""")).as("p"))
      .select(col("p.doc1"), col("p.ss1"), col("p.doc2"), col("p.ss2"))
      .dropDuplicates("doc1", "doc2")

    // exact verification of candidates only
    candidates
      .withColumn("common", size(array_intersect(col("ss1"), col("ss2"))))
      .withColumn("jaccard",
        col("common").cast("double") /
          (size(col("ss1")) + size(col("ss2")) - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc1"), col("doc2"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** SimHash near-dup: 64-bit token-weighted signature; near-dups = pairs
    * within `maxHamming`. Pairing uses the block trick (split the signature
    * into `blocks` chunks; pairs within hamming k must agree on ≥1 chunk
    * when blocks > k), so again no O(n²) scan.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 6, blocks: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(blocks > maxHamming, "need blocks > maxHamming for exact block-trick recall")
    val bitsPerBlock = 64 / blocks
    // Signature: sign of per-bit weighted sum over distinct shingle hashes.
    // ONE pass over the shingles (one xxhash64 each), accumulating a 64-wide
    // counter array via zip_with — not 64 separate aggregates, which would
    // re-scan the array per bit and blow up codegen (measured 35× slower).
    val toks = distinctShingles(col(textCol), 3)
    val bitIdx = sequence(lit(0), lit(63))
    val counters = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, bitIdx, (a, b) =>
          a + when(call_function("shiftright", h, b).bitwiseAND(lit(1L)) === 1L,
                   lit(1L)).otherwise(lit(-1L)))
      })
    val sig = aggregate(
      zip_with(counters, bitIdx, (cnt, b) =>
        when(cnt >= 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
    val s = docs.select(col(idCol).as("doc_id"), sig.as("sig"))

    val blocked = s.select(col("doc_id"), col("sig"),
      explode(array((0 until blocks).map { blk =>
        struct(lit(blk).as("blk"),
          shiftright(col("sig"), blk * bitsPerBlock)
            .bitwiseAND(lit((1L << bitsPerBlock) - 1)).as("chunk"))
      }: _*)).as("b"))
      .select(col("doc_id"), col("sig"), col("b.blk"), col("b.chunk"))

    val a = blocked.as("a")
    val b = blocked.as("b")
    a.join(b,
        col("a.blk") === col("b.blk") && col("a.chunk") === col("b.chunk") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"),
              hammingDistance(col("a.sig"), col("b.sig")).as("hamming"))
      .dropDuplicates("doc1", "doc2")
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-dup pairs. Exact all-pairs within label blocks
    * (block on a cheap equi key to avoid the full cross product); the
    * unblocked scale path is `Similarity.lshBuckets`.
    */
  def embeddingCosinePairs(emb: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      blockCol: Option[String] = Some("label")): DataFrame = {
    val a = emb.select(col(idCol).as("id1"), col(vecCol).as("v1"),
      blockCol.map(col).getOrElse(lit(0)).as("blk1"))
    val b = emb.select(col(idCol).as("id2"), col(vecCol).as("v2"),
      blockCol.map(col).getOrElse(lit(0)).as("blk2"))
    a.join(b, col("blk1") === col("blk2") && col("id1") < col("id2"))
      .withColumn("cos", cosineSimilarity(col("v1"), col("v2")))
      .filter(col("cos") >= threshold)
      .select(col("id1"), col("id2"), round(col("cos"), 4).as("cos"))
  }
}
