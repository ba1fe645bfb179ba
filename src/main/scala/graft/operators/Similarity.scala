package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate / exact nearest-neighbour search over an embedding column
  * (`ArrayType(FloatType)`) — north-star extension ops.
  *
  * Scale design: brute force is the correctness baseline (a broadcast of
  * the query vectors against a full scan — linear, embarrassingly
  * parallel, no shuffle of the corpus). The scale path is LSH bucketing
  * (random-hyperplane signatures): the corpus is shuffled ONCE on bucket
  * id, probes hit only matching buckets, and recall is tuned by signature
  * width / multi-probe. An IVF variant (k-means cells) would slot into the
  * same bucket-join shape; hyperplane LSH needs no trained model, which
  * keeps the operator deterministic for the oracle corpus.
  */
object Similarity {

  /** The shared ranking tail of every top-k operator: per-query rank by
    * (cos desc, neighbor_id) — deterministic under ties — keep rank ≤ k,
    * round cos to the oracle's 4 decimals. One definition so tie-breaking
    * and rounding can never drift between the exact and ANN paths.
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
              round(col("cos"), 4).as("cos"), col("rank"))
  }


  /** Exact top-k by cosine for each query row (queries small → broadcast).
    * Output: one row per (query_id, neighbour) kept by rank ≤ k.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    graft.plans.GraftFunctions.ensure(corpus.sparkSession)
    // norms hoisted out of the pair loop: once per query + once per corpus
    // row, with pair-side arithmetic bit-identical to cosineSimilarity
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm2Fast(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      norm2Fast(col(vecCol)).as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", dotFast(col("qv"), col("cv")) / (col("qn") * col("cn")))
    rankTopK(scored, k)
  }

  /** Corpus bucketing by `nBits`-bit hyperplane signature. At scale this is
    * written once (partitioned/bucketed by `bucket`) and probed many times.
    */
  def lshBuckets(corpus: DataFrame, nBits: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    graft.plans.GraftFunctions.ensure(corpus.sparkSession)
    corpus.withColumn("bucket", hyperplaneSignature(col(vecCol), nBits))
  }

  /** ANN top-k: probe only buckets within `maxHamming` of the query's
    * signature (multi-probe LSH). Join fans out per probe-bucket instead of
    * per corpus row — sub-linear reads once the bucket table is partitioned
    * by `bucket`.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, nBits: Int,
      maxHamming: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    graft.plans.GraftFunctions.ensure(corpus.sparkSession)
    val bucketed = lshBuckets(corpus, nBits, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
              norm2Fast(col(vecCol)).as("cn"), col("bucket"))
    val q = lshBuckets(queries, nBits, idCol, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
              norm2Fast(col(vecCol)).as("qn"), col("bucket").as("qbucket"))
    // multi-probe: query bucket + every bucket at hamming distance ≤
    // maxHamming — all XOR masks with 1..maxHamming bits set (Σ C(nBits,h)
    // probes; combinatorial in maxHamming, so callers keep it small).
    require(maxHamming >= 0 && maxHamming <= nBits,
      s"maxHamming must be in [0, $nBits], got $maxHamming")
    val masks: Seq[Long] = (1 to maxHamming).flatMap { h =>
      (0 until nBits).combinations(h)
        .map(_.foldLeft(0L)((m, b) => m | (1L << b))).toSeq
    }
    val probes = col("qbucket") +:
      masks.map(m => col("qbucket").bitwiseXOR(lit(m)))
    val probed = q.withColumn("probe", explode(array(probes: _*)))
    val scored = probed.join(bucketed, col("probe") === col("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", dotFast(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .dropDuplicates("query_id", "neighbor_id")
    rankTopK(scored, k)
  }

  /** Multi-table LSH ANN — the standard recall amplification: `nTables`
    * INDEPENDENT signature tables of `nBits` each (sliced from one wide
    * `hyperplaneSignature` call, whose per-bit hyperplanes are already
    * independent), a pair is a candidate when it collides in ANY table.
    * Candidate probability for a neighbour whose per-bit agreement is p
    * rises from p^b (single table) to 1-(1-p^b)^L — the OR-amplified
    * S-curve — while probe cost grows only linearly in L.
    *
    * Scale shape is identical to `lshTopK`: the corpus is exploded to
    * (table, chunk) rows ONCE (at scale: written bucketed by (table,
    * chunk) and probed many times), probes hit matching chunks only, and
    * `maxHamming` adds per-table multi-probe on top. nBits × nTables ≤ 63.
    */
  def lshTopKMulti(corpus: DataFrame, queries: DataFrame, k: Int,
      nBits: Int = 8, nTables: Int = 7, maxHamming: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(nBits >= 1 && nTables >= 1 && nBits * nTables <= 63,
      s"need nBits*nTables in [1,63], got $nBits*$nTables")
    require(maxHamming >= 0 && maxHamming <= nBits,
      s"maxHamming must be in [0, $nBits], got $maxHamming")
    graft.plans.GraftFunctions.ensure(corpus.sparkSession)
    val mask = (1L << nBits) - 1
    def chunks(df: DataFrame, id: String, vec: String, nrm: String,
        out: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
          norm2Fast(col(vecCol)).as(nrm),
          hyperplaneSignature(col(vecCol), nBits * nTables).as("__sig"))
        .select(col(id), col(vec), col(nrm),
          explode(array((0 until nTables).map { t =>
            struct(lit(t).as("tbl"),
              shiftrightunsigned(col("__sig"), t * nBits)
                .bitwiseAND(lit(mask)).as("chunk"))
          }: _*)).as(out))
    val c = chunks(corpus, "neighbor_id", "cv", "cn", "b")
      .select(col("neighbor_id"), col("cv"), col("cn"),
        col("b.tbl"), col("b.chunk"))
    // per-table multi-probe masks (single-bit flips and up, within a table)
    val masks: Seq[Long] = 0L +: (1 to maxHamming).flatMap { h =>
      (0 until nBits).combinations(h)
        .map(_.foldLeft(0L)((m, b) => m | (1L << b))).toSeq
    }
    val q = chunks(queries, "query_id", "qv", "qn", "b")
      .select(col("query_id"), col("qv"), col("qn"),
        col("b.tbl").as("qtbl"),
        explode(array(masks.map(m =>
          col("b.chunk").bitwiseXOR(lit(m))): _*)).as("probe"))
    val scored = q.join(c, col("qtbl") === col("tbl") && col("probe") === col("chunk"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cos", dotFast(col("qv"), col("cv")) / (col("qn") * col("cn")))
    rankTopK(scored, k)
  }

  /** IVF (inverted-file) ANN: partition the corpus into `nCells` Voronoi
    * cells around deterministically-sampled seed vectors, then probe only
    * the `nProbe` nearest cells per query. The trained-index analogue of
    * `lshTopK` with the same bucket-join shape:
    *
    *  - seeds = the nCells corpus rows with smallest xxhash64(id) — a
    *    deterministic uniform sample, no model state, reproducible on any
    *    cluster;
    *  - assignment = one broadcast pass over the corpus (corpus never
    *    shuffles until the final per-cell join);
    *  - at scale the assigned corpus is written partitioned by `cell`, so
    *    a probe reads nProbe/nCells of the data.
    *
    * Recall is governed by nProbe (cluster-boundary misses only).
    */
  /** The deterministic IVF seed table (cell_id, cv, cn2 = ‖cv‖²): the
    * nCells corpus rows with smallest xxhash64(id). Public so the driver
    * gate can materialize it and have DuckDB re-derive cell assignment,
    * probe selection, and scoring from the seeds alone — everything in
    * `ivfTopK` downstream of seed selection is plain relational algebra.
    */
  def ivfSeeds(corpus: DataFrame, nCells: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    graft.plans.GraftFunctions.ensure(corpus.sparkSession)
    corpus
      .select(col(idCol).as("cell_id"), col(vecCol).as("cv"))
      .orderBy(xxhash64(col("cell_id")))
      .limit(nCells)
      .select(col("cell_id"), col("cv"),
        dotFast(col("cv"), col("cv")).as("cn2"))
  }

  /** ALL IVF seeds as one array-of-structs row, broadcast to every
    * partition: nearest cells are then a NARROW per-row array expression
    * (sort the per-seed scores, slice the head) — no window, no exchange;
    * the corpus genuinely never shuffles until the final per-cell join.
    */
  private def ivfSeedArray(corpus: DataFrame, nCells: Int,
      idCol: String, vecCol: String): DataFrame =
    ivfSeeds(corpus, nCells, idCol, vecCol).agg(
      collect_list(struct(col("cell_id"), col("cv"), col("cn2"))).as("seedset"))

  /** Append the `nTake` nearest cell ids (exploded when nTake > 1) to each
    * row of `df`, against a broadcast `ivfSeedArray`. The |v|² term is
    * constant per row, so ranking by (|c|² − 2·v·c) is the same argmin as
    * euclidean distance; the (d2, cell_id) struct sort makes it
    * deterministic under ties. Shared by `ivfTopK` and `ivfPqTopK` so cell
    * semantics can never drift between the two.
    */
  private def assignCells(df: DataFrame, seedArr: DataFrame, vec: String,
      out: String, nTake: Int): DataFrame = {
    val ranked = array_sort(transform(col("seedset"), s =>
      struct((s("cn2") - lit(2.0) * dotFast(col(vec), s("cv"))).as("d2"),
             s("cell_id").as("cell_id"))))
    val cells =
      if (nTake == 1) element_at(ranked, 1)("cell_id")
      else explode(transform(slice(ranked, 1, nTake), c => c("cell_id")))
    df.crossJoin(broadcast(seedArr))
      .withColumn(out, cells)
      .select(df.columns.map(col) :+ col(out): _*)
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    graft.plans.GraftFunctions.ensure(corpus.sparkSession)
    val seedArr = ivfSeedArray(corpus, nCells, idCol, vecCol)
    val assigned = assignCells(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"),
        norm2Fast(col(vecCol)).as("cn")),
      seedArr, "nv", "cell", 1)
    val probes = assignCells(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        norm2Fast(col(vecCol)).as("qn")),
      seedArr, "qv", "probe_cell", nProbe)
    // no candidate dedup needed (unlike the LSH path, where overlapping
    // buckets duplicate pairs): every neighbor holds exactly ONE cell
    // (nTake = 1) and a query's probe cells are distinct (seed ids are
    // distinct corpus ids), so each (query, neighbor) pair joins at most
    // once — a dropDuplicates here was a pure extra shuffle
    val scored = probes.join(assigned, col("probe_cell") === col("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", dotFast(col("qv"), col("nv")) / (col("qn") * col("cn")))
    rankTopK(scored, k)
  }

  /** Product-quantization ANN (PQ-ADC with exact re-rank) — the
    * memory-bounded rung of the scale ladder (brute force → LSH → IVF →
    * PQ). At 100 TB of embeddings the corpus can't be re-scanned as raw
    * vectors; PQ stores each vector as `m` small codes (m bytes/row vs
    * 4·dims), so the candidate scan reads a table ~`4·dims/m`× smaller
    * and the full-precision vectors are touched only for the
    * `rerank`-sized candidate set per query.
    *
    *  - codebook: the vector is split into `m` subvectors of `dims/m`;
    *    each subspace's `ksub` centroids are the subvectors of the ksub
    *    corpus rows with smallest xxhash64(id) — the same deterministic
    *    sample-seeding as `ivfTopK` (no trained model state, reproducible
    *    on any cluster). Broadcast as ONE array row: m·ksub·dims/m floats.
    *  - encode: per corpus row, code[j] = argmin over centroids of
    *    ||x_j − c||² — a NARROW per-row expression (argmin by the same
    *    array_sort trick as IVF cell assignment). One-time cost; at scale
    *    the (id, codes, norm) table is written once and re-scanned per
    *    query batch.
    *  - ADC scan: per query, a lookup table qlut[j][i] = q_j · c_{j,i} is
    *    computed ONCE (narrow, m·ksub dots of length dims/m), then every
    *    candidate costs m array lookups + adds instead of a dims-long dot:
    *    approx_dot = Σ_j qlut[j][codes[j]].
    *  - re-rank: the top-`rerank` candidates by approximate cosine
    *    (approx_dot over EXACT stored norms) fetch their raw vectors via a
    *    broadcast semi-join fetch and are re-scored exactly; top-k of the
    *    exact scores is returned through the shared `rankTopK` tail.
    *
    * `rerank >= corpus size` makes the candidate stage lossless, so the
    * result provably equals `bruteForceTopK` whatever the codebook quality
    * — that is the driver-oracled parameter point (sim_ann_pq_exhaustive);
    * production points trade `rerank` against recall (recall floor pinned
    * in SimilaritySpec).
    *
    * Sizing `rerank`: ADC cannot order vectors that share identical codes,
    * and a tight cluster quantizes to ONE code per subspace — so `rerank`
    * must cover the largest expected quantization-tie set (≥ the densest
    * cluster's size, or raise `m`/`ksub` for finer codes). The SimilaritySpec
    * clustered-corpus case pins exactly this contract.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      dims: Int = 64, m: Int = 8, ksub: Int = 16, rerank: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(m >= 1 && dims % m == 0,
      s"dims ($dims) must divide into m ($m) equal subvectors")
    require(ksub >= 1 && rerank >= k,
      s"need ksub >= 1 and rerank ($rerank) >= k ($k)")
    graft.plans.GraftFunctions.ensure(corpus.sparkSession)
    val sub = dims / m
    def subv(v: Column, j: Column): Column = slice(v, j * sub + lit(1), lit(sub))
    val js = sequence(lit(0), lit(m - 1))
    val seedArr = pqCodebookNested(corpus, dims, m, ksub, idCol, vecCol)
    // encode: ‖c‖² − 2·x_j·c ranks centroids identically to ‖x_j − c‖²
    // (‖x_j‖² is constant per (row, subspace)); (d2, idx) struct sort
    // makes the argmin deterministic under ties. zip_with binds each
    // corpus subvector ONCE (m slices per row, not m·ksub).
    def codesFor(vec: Column): Column =
      zip_with(transform(js, j => subv(vec, j)), col("cbs"),
        (xj, cj) => element_at(array_sort(transform(cj, (c, i) =>
          struct((c("n2") - lit(2.0) * dotFast(xj, c("sv"))).as("d2"),
                 i.as("i")))), 1)("i"))
    val encoded = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .crossJoin(broadcast(seedArr))
      .select(col("neighbor_id"), codesFor(col("cv")).as("codes"),
              norm2Fast(col("cv")).as("cn"))
    // the ADC side needs only (id, norm, LUT) — the raw query vector stays
    // out of the broadcast and is re-attached at the k-row re-rank below
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(broadcast(seedArr))
      .select(col("query_id"), norm2Fast(col("qv")).as("qn"),
        zip_with(transform(js, j => subv(col("qv"), j)), col("cbs"),
          (qj, cj) => transform(cj, c => dotFast(qj, c("sv")))).as("qlut"))
    // ADC scan: m lookups per (query, code-row) pair
    val approx = encoded.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("approx_cos",
        aggregate(
          zip_with(col("codes"), col("qlut"),
            (cd, lj) => element_at(lj, cd + 1)),
          lit(0.0), (acc, x) => acc + x) / (col("qn") * col("cn")))
    val wa = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("approx_cos").desc, col("neighbor_id"))
    // candidate set is ID PAIRS only (16 bytes/row in the broadcast, not
    // the 64-float query vector per candidate)
    val cand = approx
      .withColumn("arank", row_number().over(wa))
      .filter(col("arank") <= rerank)
      .select(col("query_id"), col("neighbor_id"))
    // exact re-rank: fetch raw vectors for the candidate set only; query
    // vectors re-attached by a tiny broadcast keyed on query_id
    val qfull = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm2Fast(col(vecCol)).as("qn"))
    val orig = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"), norm2Fast(col(vecCol)).as("cn"))
    val scored = orig.join(broadcast(cand), Seq("neighbor_id"))
      .join(broadcast(qfull), Seq("query_id"))
      .withColumn("cos", dotFast(col("qv"), col("cv")) / (col("qn") * col("cn")))
    rankTopK(scored, k)
  }

  /** Composed IVF-PQ — the standard production ANN index at 100 TB (cells
    * + codes together): IVF cell pruning bounds WHICH rows the candidate
    * scan touches (nProbe/nCells of the corpus, once the encoded table is
    * written partitioned by `cell`), PQ codes bound WHAT the scan reads
    * per row (m bytes vs 4·dims), and the exact re-rank caps the
    * full-precision fetch at `rerank` rows per query. Neither part is new:
    * cell assignment is `assignCells` against the SAME deterministic seed
    * table as `ivfTopK`, encode/LUT/ADC are the same expressions as
    * `pqTopK` (raw-vector codes against the global codebook — not
    * per-cell residual codes, which would need a codebook per cell and
    * buy little at these code rates), so each half keeps its established
    * semantics and oracle trick, and the composition is ONE join-shape
    * change: the PQ candidate scan's corpus-wide crossJoin becomes the
    * IVF per-cell equi join.
    *
    * Recall composes multiplicatively: the IVF stage can only miss a
    * true neighbour that lives outside the probed cells (boundary
    * misses, governed by nProbe), the ADC stage can only DEMOTE a
    * candidate out of the rerank cut (code coarseness, governed by
    * m/ksub/rerank) — with nProbe = nCells the result provably equals
    * `pqTopK`, and with rerank ≥ corpus it equals `ivfTopK`; both
    * identities plus the production-point recall floor are pinned in
    * SimilaritySpec.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4,
      dims: Int = 64, m: Int = 8, ksub: Int = 16, rerank: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(ksub >= 1, s"need ksub >= 1, got $ksub")
    graft.plans.GraftFunctions.ensure(corpus.sparkSession)
    val seedArr = ivfSeedArray(corpus, nCells, idCol, vecCol)
    val cbArr = pqCodebookNested(corpus, dims, m, ksub, idCol, vecCol)
    val encoded = ivfPqEncode(corpus, seedArr, cbArr, dims, m, idCol, vecCol)
    ivfPqProbeIndex(encoded, corpus, queries, seedArr, cbArr,
      k, nProbe, dims, m, rerank, idCol, vecCol)
  }

  /** One-pass IVF-PQ ENCODE of `vectors` against frozen index artifacts
    * (broadcast seed array + nested codebook): each row gets its home cell
    * (narrow argmin against the seeds), its m codes (narrow argmin per
    * subspace against the codebook), and its exact norm. At scale this
    * table is written ONCE partitioned by `cell` — and because every
    * expression is a pure per-row function of (vector, artifacts), the
    * encode is append-only INCREMENTAL by construction: encoding the
    * corpus in any number of batches yields byte-identical rows to one
    * batch, which is what lets a streaming sink maintain the index (the
    * production pattern: artifacts trained offline on a snapshot, new
    * vectors encoded online as they arrive). Output: (idCol, cell, codes,
    * cn).
    */
  def ivfPqEncode(vectors: DataFrame, seedArr: DataFrame, cbArr: DataFrame,
      dims: Int, m: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(m >= 1 && dims % m == 0,
      s"dims ($dims) must divide into m ($m) equal subvectors")
    graft.plans.GraftFunctions.ensure(vectors.sparkSession)
    val sub = dims / m
    def subv(v: Column, j: Column): Column = slice(v, j * sub + lit(1), lit(sub))
    val js = sequence(lit(0), lit(m - 1))
    def codesFor(vec: Column): Column =
      zip_with(transform(js, j => subv(vec, j)), col("cbs"),
        (xj, cj) => element_at(array_sort(transform(cj, (c, i) =>
          struct((c("n2") - lit(2.0) * dotFast(xj, c("sv"))).as("d2"),
                 i.as("i")))), 1)("i"))
    assignCells(
        vectors.select(col(idCol).as("__id"), col(vecCol).as("cv")),
        seedArr, "cv", "cell", 1)
      .crossJoin(broadcast(cbArr))
      .select(col("__id").as(idCol), col("cell"),
              codesFor(col("cv")).as("codes"), norm2Fast(col("cv")).as("cn"))
  }

  /** Probe a PREBUILT IVF-PQ index table (the `ivfPqEncode` layout)
    * against the same frozen artifacts: nProbe nearest cells per query →
    * per-cell ADC scan over the codes → rerank-sized exact re-score from
    * the raw corpus. `ivfPqTopK` is exactly artifacts + encode + this — so
    * a catalog-maintained index probed here carries the same semantics
    * and the same oracle as the one-shot query.
    */
  def ivfPqProbeIndex(encoded: DataFrame, corpus: DataFrame,
      queries: DataFrame, seedArr: DataFrame, cbArr: DataFrame,
      k: Int, nProbe: Int, dims: Int, m: Int, rerank: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(m >= 1 && dims % m == 0,
      s"dims ($dims) must divide into m ($m) equal subvectors")
    require(rerank >= k, s"need rerank ($rerank) >= k ($k)")
    graft.plans.GraftFunctions.ensure(corpus.sparkSession)
    val sub = dims / m
    def subv(v: Column, j: Column): Column = slice(v, j * sub + lit(1), lit(sub))
    val js = sequence(lit(0), lit(m - 1))
    val index = encoded.select(col(idCol).as("neighbor_id"), col("cell"),
      col("codes"), col("cn"))
    // query side: nProbe nearest cells (exploded) + the ADC lookup table
    val q = assignCells(
        queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
        seedArr, "qv", "probe_cell", nProbe)
      .crossJoin(broadcast(cbArr))
      .select(col("query_id"), col("probe_cell"),
        norm2Fast(col("qv")).as("qn"),
        zip_with(transform(js, j => subv(col("qv"), j)), col("cbs"),
          (qj, cj) => transform(cj, c => dotFast(qj, c("sv")))).as("qlut"))
    // THE composition point: pqTopK's corpus-wide crossJoin becomes the
    // per-cell equi join — the ADC scan only ever sees probed cells
    val approx = q.join(index, col("probe_cell") === col("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("approx_cos",
        aggregate(
          zip_with(col("codes"), col("qlut"),
            (cd, lj) => element_at(lj, cd + 1)),
          lit(0.0), (acc, x) => acc + x) / (col("qn") * col("cn")))
    val wa = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("approx_cos").desc, col("neighbor_id"))
    val cand = approx
      .withColumn("arank", row_number().over(wa))
      .filter(col("arank") <= rerank)
      .select(col("query_id"), col("neighbor_id"))
    // exact re-rank, identical to pqTopK's tail: candidate ID pairs only
    // in the broadcast, raw vectors fetched for rerank rows per query
    val qfull = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm2Fast(col(vecCol)).as("qn"))
    val orig = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"), norm2Fast(col(vecCol)).as("cn"))
    val scored = orig.join(broadcast(cand), Seq("neighbor_id"))
      .join(broadcast(qfull), Seq("query_id"))
      .withColumn("cos", dotFast(col("qv"), col("cv")) / (col("qn") * col("cn")))
    rankTopK(scored, k)
  }

  /** The frozen IVF-PQ index artifacts as broadcastable one-row frames:
    * (seed array, nested codebook) — public so index-maintenance sinks
    * can share the exact artifacts `ivfPqTopK` derives internally.
    */
  def ivfPqArtifacts(corpus: DataFrame, nCells: Int, dims: Int, m: Int,
      ksub: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): (DataFrame, DataFrame) =
    (ivfSeedArray(corpus, nCells, idCol, vecCol),
     pqCodebookNested(corpus, dims, m, ksub, idCol, vecCol))

  /** FILTERED ANN — top-k under a metadata predicate, the query shape
    * every production vector store serves (`WHERE label = 'en' ORDER BY
    * cosine DESC LIMIT k`). Two design points make it the 100 TB shape
    * rather than a post-filter:
    *
    *  - the metadata columns are DENORMALIZED into the encoded index rows
    *    at build time, so the predicate prunes the ADC scan itself — the
    *    per-cell equi join only ever sees rows that already passed the
    *    filter (a post-pass would ADC-score everything and then throw the
    *    non-matching majority away, k would silently shrink);
    *  - the probe plan ADAPTS to post-filter yield deterministically: all
    *    `nCells` cells are ranked per query (at real cell counts, capped
    *    by ranking only the best few × nProbe — the ranking is a narrow
    *    broadcast expression either way), each cell's post-filter yield
    *    comes from an nCells-row count table (at scale: index stats
    *    maintained at build), and a cell is probed iff it is within the
    *    fixed `nProbe` floor OR the exclusive prefix yield of
    *    better-ranked cells is still short of `rerank + 1`. A selective
    *    filter therefore widens the probe ring until ≥ min(rerank,
    *    |filtered corpus|) candidates reach the scan — k survivors are
    *    guaranteed whenever the filtered corpus has k — while a permissive
    *    filter degenerates to exactly `ivfPqTopK`'s fixed-nProbe plan.
    *
    * The tail (query LUT, per-cell ADC join, rerank cut, exact re-score)
    * is `ivfPqProbeIndex`'s, over the filtered index.
    */
  def ivfPqTopKFiltered(corpus: DataFrame, queries: DataFrame, k: Int,
      metaFilter: Column, metaCols: Seq[String],
      nCells: Int = 16, nProbe: Int = 4,
      dims: Int = 64, m: Int = 8, ksub: Int = 16, rerank: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(m >= 1 && dims % m == 0,
      s"dims ($dims) must divide into m ($m) equal subvectors")
    require(rerank >= k, s"need rerank ($rerank) >= k ($k)")
    graft.plans.GraftFunctions.ensure(corpus.sparkSession)
    val W = org.apache.spark.sql.expressions.Window
    val seedArr = ivfSeedArray(corpus, nCells, idCol, vecCol)
    val cbArr = pqCodebookNested(corpus, dims, m, ksub, idCol, vecCol)
    // index build: codes + metadata per row (the id join is build-time
    // cost; a production encode emits the metadata inline)
    val index = ivfPqEncode(corpus, seedArr, cbArr, dims, m, idCol, vecCol)
      .join(corpus.select((col(idCol) +: metaCols.map(c => col(c))): _*),
        Seq(idCol))
    val idxF = index.filter(metaFilter)
      .select(col(idCol).as("neighbor_id"), col("cell"), col("codes"),
        col("cn"))
    val cellCnt = idxF.groupBy(col("cell")).agg(count(lit(1)).as("cnt"))
    // probe plan: rank all cells per query, join the yield table, keep a
    // cell while the exclusive prefix of better cells is short of rerank
    val ranked = array_sort(transform(col("seedset"), s =>
      struct((s("cn2") - lit(2.0) * dotFast(col("qv"), s("cv"))).as("d2"),
             s("cell_id").as("cell_id"))))
    val probesAll = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(broadcast(seedArr))
      .select(col("query_id"), col("qv"),
        posexplode(transform(ranked, c => c("cell_id")))
          .as(Seq("pos", "probe_cell")))
    val wPrefix = W.partitionBy(col("query_id")).orderBy(col("pos"))
      .rowsBetween(W.unboundedPreceding, -1)
    val probes = probesAll
      .join(broadcast(cellCnt), col("probe_cell") === col("cell"), "left")
      .withColumn("prefix",
        coalesce(sum(coalesce(col("cnt"), lit(0L))).over(wPrefix), lit(0L)))
      .filter(col("pos") < nProbe || col("prefix") < rerank + 1)
      .select(col("query_id"), col("qv"), col("probe_cell"))
    // ivfPqProbeIndex's tail over the FILTERED index
    val sub = dims / m
    def subv(v: Column, j: Column): Column = slice(v, j * sub + lit(1), lit(sub))
    val js = sequence(lit(0), lit(m - 1))
    val q = probes.crossJoin(broadcast(cbArr))
      .select(col("query_id"), col("probe_cell"),
        norm2Fast(col("qv")).as("qn"),
        zip_with(transform(js, j => subv(col("qv"), j)), col("cbs"),
          (qj, cj) => transform(cj, c => dotFast(qj, c("sv")))).as("qlut"))
    val approx = q.join(idxF, col("probe_cell") === col("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("approx_cos",
        aggregate(
          zip_with(col("codes"), col("qlut"),
            (cd, lj) => element_at(lj, cd + 1)),
          lit(0.0), (acc, x) => acc + x) / (col("qn") * col("cn")))
    val wa = W.partitionBy(col("query_id"))
      .orderBy(col("approx_cos").desc, col("neighbor_id"))
    val cand = approx
      .withColumn("arank", row_number().over(wa))
      .filter(col("arank") <= rerank)
      .select(col("query_id"), col("neighbor_id"))
    val qfull = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm2Fast(col(vecCol)).as("qn"))
    val orig = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"), norm2Fast(col(vecCol)).as("cn"))
    val scored = orig.join(broadcast(cand), Seq("neighbor_id"))
      .join(broadcast(qfull), Seq("query_id"))
      .withColumn("cos", dotFast(col("qv"), col("cv")) / (col("qn") * col("cn")))
    rankTopK(scored, k)
  }

  /** RESIDUAL-encoded IVF-PQ — the composition `ivfPqTopK` does with raw
    * vectors, done the way production indexes (the FAISS `IVFPQ` default)
    * actually do it: each corpus vector is PQ-encoded as its residual
    * x − c(x) from its home-cell centroid, and the codebook is trained on
    * residuals. Residuals of a clustered corpus are centered near zero
    * with far smaller spread than raw vectors, so the same code budget
    * (m·log₂ksub bits) quantizes much finer — that is the entire reason
    * the production shape composes this way instead of reusing global raw
    * codes per cell.
    *
    * ADC decomposes exactly: q·x ≈ q·c + q·r̂ — one scalar per
    * (query, probed cell) (q·c, the centroid dot) plus the usual
    * per-subspace LUT over RESIDUAL centroids; approximate cosine divides
    * by the TRUE stored norms, so the rerank cut ranks the same quantity
    * as the non-residual variant. All arithmetic that touches residuals
    * runs in DOUBLE on both engines (float subtraction would round
    * differently than DuckDB's double path); the codegen `vec_dot` kernel
    * handles double arrays natively, so nothing leaves whole-stage
    * codegen.
    *
    * Identities pinned in SimilaritySpec: nProbe = nCells ∧ rerank ≥
    * corpus ⇒ equals brute force exactly (the ADC stage can only order,
    * the probe stage prunes nothing); the production point's recall floor
    * on a clustered corpus. Scale shape is `ivfPqTopK`'s: one-pass
    * encode, per-cell equi-join candidate scan, id-pair rerank broadcast.
    */
  def ivfPqTopKResidual(corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4,
      dims: Int = 64, m: Int = 8, ksub: Int = 16, rerank: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(m >= 1 && dims % m == 0,
      s"dims ($dims) must divide into m ($m) equal subvectors")
    require(ksub >= 1 && rerank >= k,
      s"need ksub >= 1 and rerank ($rerank) >= k ($k)")
    graft.plans.GraftFunctions.ensure(corpus.sparkSession)
    val sub = dims / m
    def subv(v: Column, j: Column): Column = slice(v, j * sub + lit(1), lit(sub))
    val js = sequence(lit(0), lit(m - 1))
    val seedArr = ivfSeedArray(corpus, nCells, idCol, vecCol)
    val cbArr = ivfPqResidualCodebookNested(corpus, nCells, dims, m, ksub,
      idCol, vecCol)
    // nearest cells WITH their centroid vectors (the residual needs cv, so
    // the ranked struct carries it; cell_id is unique, cv never tiebreaks)
    def rankedCells(vec: Column): Column =
      array_sort(transform(col("seedset"), s =>
        struct((s("cn2") - lit(2.0) * dotFast(vec, s("cv"))).as("d2"),
               s("cell_id").as("cell_id"), s("cv").as("cv"))))
    def residual(vec: Column, centroid: Column): Column =
      zip_with(vec, centroid, (a, b) => a.cast("double") - b.cast("double"))
    def codesFor(res: Column): Column =
      zip_with(transform(js, j => subv(res, j)), col("cbs"),
        (xj, cj) => element_at(array_sort(transform(cj, (c, i) =>
          struct((c("n2") - lit(2.0) * dotFast(xj, c("sv"))).as("d2"),
                 i.as("i")))), 1)("i"))
    val encoded = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv0"))
      .crossJoin(broadcast(seedArr))
      .withColumn("best", element_at(rankedCells(col("cv0")), 1))
      .crossJoin(broadcast(cbArr))
      .select(col("neighbor_id"), col("best")("cell_id").as("cell"),
        codesFor(residual(col("cv0"), col("best")("cv"))).as("codes"),
        norm2Fast(col("cv0")).as("cn"))
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(broadcast(seedArr))
      .withColumn("pc", explode(slice(rankedCells(col("qv")), 1, nProbe)))
      .crossJoin(broadcast(cbArr))
      .select(col("query_id"), col("pc")("cell_id").as("probe_cell"),
        dotFast(col("qv"), col("pc")("cv")).as("qdotc"),
        norm2Fast(col("qv")).as("qn"),
        zip_with(transform(js, j =>
            transform(subv(col("qv"), j), x => x.cast("double"))), col("cbs"),
          (qj, cj) => transform(cj, c => dotFast(qj, c("sv")))).as("qlut"))
    val approx = q.join(encoded, col("probe_cell") === col("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      // fold starts from q·c, then adds the m residual-LUT terms in
      // subspace order — the same left-to-right double chain as the oracle
      .withColumn("approx_cos",
        aggregate(
          zip_with(col("codes"), col("qlut"),
            (cd, lj) => element_at(lj, cd + 1)),
          col("qdotc"), (acc, x) => acc + x) / (col("qn") * col("cn")))
    val wa = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("approx_cos").desc, col("neighbor_id"))
    val cand = approx
      .withColumn("arank", row_number().over(wa))
      .filter(col("arank") <= rerank)
      .select(col("query_id"), col("neighbor_id"))
    val qfull = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm2Fast(col(vecCol)).as("qn"))
    val orig = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"), norm2Fast(col(vecCol)).as("cn"))
    val scored = orig.join(broadcast(cand), Seq("neighbor_id"))
      .join(broadcast(qfull), Seq("query_id"))
      .withColumn("cos", dotFast(col("qv"), col("cv")) / (col("qn") * col("cn")))
    rankTopK(scored, k)
  }

  /** The residual codebook as ONE nested row: cbs[j][i] = (sv: DOUBLE
    * subvector j of sample-row i's residual from its own home-cell
    * centroid, n2: ‖sv‖²). Sample selection is the same smallest-
    * xxhash64(id) rule as every seeded artifact (array position after the
    * (hash, residual) struct sort is the stable centroid index).
    */
  private def ivfPqResidualCodebookNested(corpus: DataFrame, nCells: Int,
      dims: Int, m: Int, ksub: Int, idCol: String,
      vecCol: String): DataFrame = {
    graft.plans.GraftFunctions.ensure(corpus.sparkSession)
    val sub = dims / m
    val js = sequence(lit(0), lit(m - 1))
    val seedArr = ivfSeedArray(corpus, nCells, idCol, vecCol)
    corpus
      .select(xxhash64(col(idCol)).as("h"), col(vecCol).as("v"))
      .orderBy(col("h"))
      .limit(ksub)
      .crossJoin(broadcast(seedArr))
      .withColumn("best", element_at(
        array_sort(transform(col("seedset"), s =>
          struct((s("cn2") - lit(2.0) * dotFast(col("v"), s("cv"))).as("d2"),
                 s("cell_id").as("cell_id"), s("cv").as("cv")))), 1))
      .withColumn("r", zip_with(col("v"), col("best")("cv"),
        (a, b) => a.cast("double") - b.cast("double")))
      .agg(array_sort(collect_list(struct(col("h"), col("r")))).as("cb"))
      .select(transform(js, j => transform(col("cb"), c =>
        struct(slice(c("r"), j * sub + lit(1), lit(sub)).as("sv"),
               dotFast(slice(c("r"), j * sub + lit(1), lit(sub)),
                       slice(c("r"), j * sub + lit(1), lit(sub))).as("n2"))))
        .as("cbs"))
  }

  /** Flat (j, i, sv, n2) view of the residual codebook for oracle
    * materialization — exploded from the SAME one-row plan
    * `ivfPqTopKResidual` broadcasts (sv already DOUBLE).
    */
  def ivfPqResidualCodebook(corpus: DataFrame, nCells: Int = 16,
      dims: Int = 64, m: Int = 8, ksub: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    ivfPqResidualCodebookNested(corpus, nCells, dims, m, ksub, idCol, vecCol)
      .select(posexplode(col("cbs")).as(Seq("j", "cj")))
      .select(col("j"), posexplode(col("cj")).as(Seq("i", "c")))
      .select(col("j").cast("int").as("j"), col("i").cast("int").as("i"),
              col("c")("sv").as("sv"), col("c")("n2").as("n2"))

  /** The PQ codebook as ONE nested row, the shape `pqTopK` broadcasts:
    * cbs[j][i] = (sv: centroid subvector j of seed i, n2: ‖sv‖²), seeds
    * being the `ksub` corpus rows with smallest xxhash64(id) ordered by
    * that hash (array POSITION is the stable centroid index shared by
    * encode and LUT).
    */
  private def pqCodebookNested(corpus: DataFrame, dims: Int, m: Int,
      ksub: Int, idCol: String, vecCol: String): DataFrame = {
    graft.plans.GraftFunctions.ensure(corpus.sparkSession)
    val sub = dims / m
    def subv(v: Column, j: Column): Column = slice(v, j * sub + lit(1), lit(sub))
    val js = sequence(lit(0), lit(m - 1))
    corpus
      .select(xxhash64(col(idCol)).as("h"), col(vecCol).as("v"))
      .orderBy(col("h"))
      .limit(ksub)
      .agg(array_sort(collect_list(struct(col("h"), col("v")))).as("cb"))
      .select(transform(js, j => transform(col("cb"), c =>
        struct(subv(c("v"), j).as("sv"),
               dotFast(subv(c("v"), j), subv(c("v"), j)).as("n2"))))
        .as("cbs"))
  }

  /** Flat (j, i, sv, n2) view of the PQ codebook for oracle
    * materialization — exploded from the SAME one-row plan `pqTopK`
    * broadcasts, so the values an external engine reads back are
    * bit-identical to what encode/LUT consume by construction (seed
    * selection by xxhash64 is the only non-SQL-expressible step of the
    * whole PQ cascade; everything downstream — per-subspace argmin encode,
    * query LUTs, ADC scoring, rerank cut, exact re-score — is plain
    * relational algebra over this table).
    */
  def pqCodebook(corpus: DataFrame, dims: Int = 64, m: Int = 8,
      ksub: Int = 16, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    pqCodebookNested(corpus, dims, m, ksub, idCol, vecCol)
      .select(posexplode(col("cbs")).as(Seq("j", "cj")))
      .select(col("j"), posexplode(col("cj")).as(Seq("i", "c")))
      .select(col("j").cast("int").as("j"), col("i").cast("int").as("i"),
              col("c")("sv").as("sv"), col("c")("n2").as("n2"))

  /** Per-group vector centroid via posexplode + partial-aggregating groupBy
    * (dimension-parallel, no buffer object churn). Output: one row per
    * (group, dim) — the layout that feeds IVF cell assignment.
    */
  def centroidByGroup(emb: DataFrame, groupCol: String,
      vecCol: String = "embedding"): DataFrame =
    emb.select(col(groupCol), posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy(col(groupCol), col("dim"))
      .agg(round(avg(col("x").cast("double")), 6).as("centroid"))

  /** MMR (maximal marginal relevance) diversified re-rank: greedily select
    * `k` of the query's top-`pool` neighbours maximizing
    * λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s) — the standard
    * redundancy-suppressing re-rank of a retrieval stage (Carbonell &
    * Goldstein 1998). Output: (rank, vec_id, rel) in selection order.
    *
    * Scale + determinism: the DISTRIBUTED work is candidate generation
    * (any top-k op) and the pool×pool pair-sim table — pool is a caller
    * PARAMETER (`require`d ≤ 1000), so both are re-rank-sized, never
    * corpus-sized. The greedy itself is inherently sequential (each pick
    * conditions the next), so it runs on the collected ≤pool² pair table
    * — the same counted-driver-gate pattern as `Clusters`' union-find.
    * Relevance and pair sims come from the SAME dot/norm kernels the
    * oracle's list_cosine_similarity matches bit-for-bit today;
    * comparisons round the marginal score to a pinned 12-decimal scale
    * (mirrored in the oracle SQL) with a vec_id tiebreak, so even
    * ulp-level kernel drift (a DuckDB upgrade, a SIMD accumulation
    * change) cannot flip a near-tied pick on one engine only.
    */
  def mmrRerank(corpus: DataFrame, queryId: Long, pool: Int, k: Int,
      lambda: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(pool >= k && k >= 1, s"need pool >= k >= 1; got pool=$pool k=$k")
    require(pool <= 1000,
      s"pool=$pool: the greedy's driver pair table is pool²-bounded; " +
        "cap the candidate stage, not the corpus")
    val spark = corpus.sparkSession
    graft.plans.GraftFunctions.ensure(spark)
    // raw-cos candidate pool (NOT bruteForceTopK's round-4 output: the
    // greedy must compare the same raw doubles the oracle computes)
    val q = corpus.filter(col(idCol) === queryId)
      .select(col(vecCol).as("qv"), norm2Fast(col(vecCol)).as("qn"))
    val cand = corpus.filter(col(idCol) =!= queryId)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        norm2Fast(col(vecCol)).as("cn"))
      .crossJoin(broadcast(q))
      .select(col("neighbor_id"),
        (dotFast(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("rel"))
      // TakeOrderedAndProject, not a single-partition row_number sort
      .orderBy(col("rel").desc, col("neighbor_id")).limit(pool)
    val vecs = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("v"), norm2Fast(col(vecCol)).as("n"))
      .join(cand, Seq("neighbor_id"))
    val a = vecs.select(col("neighbor_id").as("a"), col("v").as("va"),
      col("n").as("na"))
    val b = vecs.select(col("neighbor_id").as("b"), col("v").as("vb"),
      col("n").as("nb"))
    val pairs = a.join(broadcast(b), col("a") < col("b"))
      .select(col("a"), col("b"),
        (dotFast(col("va"), col("vb")) / (col("na") * col("nb"))).as("s"))
    // pool²-bounded collects (counted gate above): the greedy is sequential
    val rel = cand.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sim = pairs.collect().flatMap { r =>
      val (x, y, s) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      Seq((x, y) -> s, (y, x) -> s)
    }.toMap
    val selected = scala.collection.mutable.ArrayBuffer.empty[Long]
    // marginal scores compare at a PINNED rounded scale (12 decimals,
    // mirrored in the oracle SQL): round-12 sits far below any real
    // score separation but absorbs ulp-level drift between this kernel
    // and the oracle's list_cosine_similarity, so a near-tie can never
    // flip a pick on one engine only. The vec_id tiebreak then resolves
    // genuine round-12 ties identically on both.
    // non-finite guard: a zero-norm embedding yields rel = 0/0 = NaN, and
    // BigDecimal(NaN) throws — pass non-finite scores through unrounded so
    // the compare degrades the way the raw-double compare did (NaN sorts
    // deterministically under Ordering.Double.TotalOrdering-style tupling)
    def r12(x: Double): Double =
      if (x.isNaN || x.isInfinite) x
      else BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    while (selected.length < math.min(k, rel.size)) {
      val remaining = rel.keysIterator.filterNot(selected.contains).toSeq
      val best = remaining.minBy { d =>
        val maxSim =
          if (selected.isEmpty) 0.0
          else selected.iterator.map(s => sim((d, s))).max
        val score =
          if (selected.isEmpty) r12(rel(d)) // seed = pure relevance
          else r12(lambda * rel(d) - (1.0 - lambda) * maxSim)
        (-score, d) // max score, ties to the smaller id
      }
      selected += best
    }
    import spark.implicits._
    // same non-finite guard as r12: a NaN-relevance candidate CAN be
    // selected (NaN sorts greatest under desc, and a pool ≤ k selects
    // everything), and BigDecimal(NaN) throws
    def r4(x: Double): Double =
      if (x.isNaN || x.isInfinite) x
      else BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    selected.zipWithIndex.map { case (id, i) =>
      (i + 1, id, r4(rel(id)))
    }.toSeq.toDF("rank", "vec_id", "rel")
  }
}
