package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag training documents that share at least
  * `minHits` distinct n-gram shingles with an evaluation/benchmark corpus,
  * the standard pre-training hygiene step (eval answers leaking into
  * training data inflate benchmark scores).
  *
  * Scale design: the benchmark side is small (10³–10⁷ shingles) next to a
  * 100 TB corpus, and the corpus side must stay narrow:
  *
  *  - `flagContaminated` (exact): corpus shingles (8-byte hashes, same
  *    kernel as the dedup family) stream through a BROADCAST join against
  *    the benchmark shingle set — the corpus is never shuffled; only the
  *    hit rows (matching shingles of contaminated docs) enter the per-doc
  *    count exchange, which is tiny by construction.
  *  - `flagContaminatedBloom`: when even the benchmark shingle set is too
  *    big to broadcast as a join relation, a Bloom sketch of it (bits, not
  *    a hash table) rides to executors inside a literal and each corpus
  *    shingle costs a few hash probes (`bloom_might_contain_long`,
  *    plans.BloomExpressions). False positives only — so the bloom pass is
  *    a PREFILTER producing candidate docs, and the exact join re-verifies
  *    just those. Output is identical to `flagContaminated` (spec-pinned);
  *    the sketch only changes how much of the corpus survives to the
  *    verify join.
  */
object Decontaminate {

  /** Distinct shingle hashes of the benchmark corpus, one `s` per row,
    * plus a constant `shingle_n` column recording the width it was built
    * with — so a PREBUILT table (the column survives a parquet round-trip)
    * is checked against the probe's `n`; mismatched widths would otherwise
    * join near-nothing and silently report a clean corpus.
    */
  def benchmarkShingles(bench: DataFrame, n: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    Dedup.shingleSets(bench, n, idCol, textCol)
      .select(explode(col("ss")).as("s")).distinct()
      .withColumn("shingle_n", lit(n))

  /** Exact contamination flags: (doc_id, n_hits) for corpus docs sharing
    * ≥ `minHits` distinct shingles with `bench`.
    */
  def flagContaminated(corpus: DataFrame, bench: DataFrame, n: Int,
      minHits: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    flagAgainstShingles(corpus, benchmarkShingles(bench, n, idCol, textCol),
      n, minHits, idCol, textCol)

  /** Exact flags against an already-built benchmark shingle set — both
    * entry points share this so the bloom path never re-tokenizes the
    * benchmark, and a PREBUILT shingle table (written once, probed by many
    * corpus sweeps) plugs straight in.
    */
  def flagAgainstShingles(corpus: DataFrame, benchShingles: DataFrame,
      n: Int, minHits: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val benchN: Option[Int] =
      if (!benchShingles.columns.contains("shingle_n")) None
      else benchShingles.select("shingle_n").head(1).headOption.map(_.getInt(0))
    require(benchN.forall(_ == n),
      s"benchmark shingle table was built with n=${benchN.get} but the " +
        s"probe uses n=$n — mismatched widths join near-nothing and " +
        "silently under-flag contamination")
    val bs = benchShingles.select("s")
    val cs = Dedup.shingleSets(corpus, n, idCol, textCol)
      .select(col("doc_id"), explode(col("ss")).as("s"))
    // shingle sets are distinct per doc, so count(*) counts distinct hits
    cs.join(broadcast(bs), "s")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minHits)
  }

  /** Bloom-prefiltered contamination flags — result-identical to
    * `flagContaminated`, constant executor memory on the benchmark side.
    */
  def flagContaminatedBloom(corpus: DataFrame, bench: DataFrame, n: Int,
      minHits: Int, fpp: Double = 0.01, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    graft.plans.GraftFunctions.ensure(corpus.sparkSession)
    // one benchmark tokenize for the sketch, the count, AND the verify —
    // localCheckpoint barriers the reuse (the count materializes it)
    val bs = benchmarkShingles(bench, n, idCol, textCol)
      .localCheckpoint(eager = false)
    // sketch build aggregates the SMALL side; the corpus never collects
    val nShingles = math.max(bs.count(), 1L)
    val bloom = bs.stat.bloomFilter("s", nShingles, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val cs = Dedup.shingleSets(corpus, n, idCol, textCol)
      .select(col("doc_id"), explode(col("ss")).as("s"))
    // bloom errors are one-sided (overcount only), so thresholding the
    // bloom hit-count keeps every true positive — a safe candidate set
    val candidates = cs
      .filter(graft.plans.GraftColumns.bloomMightContainLong(lit(bytes), col("s")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits_bloom"))
      .filter(col("n_hits_bloom") >= minHits)
      .select(col("doc_id").as("__cand_id"))
    val surviving = corpus.join(
      candidates, col(idCol) === col("__cand_id"), "left_semi")
    flagAgainstShingles(surviving, bs, n, minHits, idCol, textCol)
  }

  /** FUZZY decontamination: corpus docs whose n-gram Jaccard similarity
    * to SOME benchmark doc reaches `threshold` — the near-duplicate form
    * of eval-set leakage that the hit-count contracts above are blind to
    * (a lightly paraphrased benchmark answer shares most but not all
    * shingles, so no single-shingle count threshold separates it from
    * topical overlap; a similarity threshold does). Output: one row per
    * contaminated corpus doc with its BEST-matching benchmark doc
    * (max Jaccard, ties → min bench id) — deterministic, so the whole
    * fuzzy pipeline sits under an exact hash oracle.
    *
    * Scale design mirrors `Dedup.ngramJaccardPairsCapped`, asymmetric:
    * the benchmark inverted index is df-capped (a shingle in > `maxShingleDf`
    * BENCHMARK docs is boilerplate and generates only hopeless fan-out)
    * and BROADCAST — the 100 TB corpus streams through the candidate join
    * unshuffled, exactly like the exact/bloom paths. The size-ratio prune
    * (J ≥ t ⇒ min(nc,nb) ≥ t·max(nc,nb)) drops hopeless pairs inside the
    * join. Only candidate pairs (bounded by benchmark size × near-dup
    * rate) reach the full-set verify, whose `sorted_intersect_size`
    * Jaccard is exact — false positives impossible; the df cap costs only
    * recall on pairs sharing nothing but boilerplate, the standard
    * curation trade.
    */
  def flagContaminatedFuzzy(corpus: DataFrame, bench: DataFrame, n: Int,
      threshold: Double, maxShingleDf: Int = 20, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    graft.plans.GraftFunctions.ensure(corpus.sparkSession)
    val shB = Dedup.shingleSets(bench, n, idCol, textCol)
      .select(col("doc_id").as("bench_id"), col("ss").as("ssb"))
      .localCheckpoint(eager = false)
    val bIdx = shB.select(col("bench_id"), size(col("ssb")).as("nb"),
      explode(col("ssb")).as("s"))
    val bRare = bIdx.join(
      bIdx.groupBy("s").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxShingleDf).select("s"),
      "s")
    val shC = Dedup.shingleSets(corpus, n, idCol, textCol)
    val cIdx = shC.select(col("doc_id"), size(col("ss")).as("nc"),
      explode(col("ss")).as("s"))
    val candidates = cIdx.join(broadcast(bRare),
        cIdx("s") === bRare("s") &&
          least(col("nc"), col("nb")).cast("double") >=
            lit(threshold) * greatest(col("nc"), col("nb")))
      .groupBy(col("doc_id"), col("bench_id")).agg(count(lit(1)).as("c_rare"))
      .select("doc_id", "bench_id")
    candidates
      .join(shC.select(col("doc_id"), col("ss").as("ssc")), "doc_id")
      .join(shB, "bench_id")
      .withColumn("common",
        graft.plans.GraftColumns.sortedIntersectSize(col("ssc"), col("ssb")))
      .withColumn("jaccard", col("common").cast("double") /
        (size(col("ssc")) + size(col("ssb")) - col("common")))
      .filter(col("jaccard") >= threshold)
      // best benchmark match per contaminated doc: max Jaccard, ties to
      // the smallest bench id — struct max, no window
      .groupBy(col("doc_id"))
      .agg(max(struct(col("jaccard"), negate(col("bench_id")).as("__nb")))
        .as("w"))
      .select(col("doc_id"), negate(col("w")("__nb")).as("bench_id"),
        round(col("w")("jaccard"), 4).as("jaccard"))
  }
}
