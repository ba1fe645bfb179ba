package graft.queries

import graft.{NamedQuery, Tables}
import graft.functions.TextFunctions._
import graft.operators.{Dedup, Similarity}
import graft.multimodal.Multimodal
import graft.sources.Warc
import org.apache.spark.sql.functions._

/** North-star extension operators (BASELINE.json / builder brief): the
  * LLM-training-data-pipeline surface — deduplication (exact, n-gram
  * Jaccard, MinHash+LSH, SimHash, embedding-cosine), similarity search
  * (brute-force + LSH ANN), text analysis (token stats, quality, lang-ID,
  * fingerprints), and multimodal binary-column plumbing.
  *
  * Queries whose algorithm is SQL-expressible carry a DuckDB oracle that
  * mirrors the exact same computation. Seeded-hash ops (simhash, LSH, IVF,
  * PQ) materialize their deterministic signature/seed/codebook tables as a
  * query step so the oracle can recompute everything downstream of the
  * seeded kernel in plain SQL — see `materializeForOracle`. Every entry in
  * this file is hash-gated.
  */
object ExtQueries {

  /** Shared SQL fragment: normalized text + tokens, mirroring
    * TextFunctions.normText/tokens.
    */
  private val normSql = raw"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"

  /** Materialize a deterministic seeded-hash intermediate (simhash/LSH
    * signatures, IVF seeds, PQ codebooks) as parquet so the DuckDB oracle
    * can recompute everything DOWNSTREAM of it in plain SQL — the seeded
    * xxhash64 kernels themselves are the only non-SQL-expressible step, and
    * they are pinned bit-for-bit against independent reference
    * implementations in ScalaTest (VectorExpressionsSpec, DedupSpec).
    * Re-running a query always rewrites identical values (kernels are pure
    * functions of the input). Placement and gating live in
    * `graft.OracleSidecar`: `Verify` keys the root under its own output
    * directory (no cross-run clobber window) and pins the SF it verifies;
    * `Bench` disables the write entirely so the timed reps never include
    * this gate-artifact I/O. The driver's correctness gate runs Verify and
    * THEN the oracle SQL, so the table is always written before it is read.
    */
  private def materializeForOracle(df: org.apache.spark.sql.DataFrame,
      sfDir: String, name: String): Unit =
    if (graft.OracleSidecar.enabled)
      df.coalesce(1).write.mode("overwrite")
        .parquet(graft.OracleSidecar.dir(sfDir, name))

  private def oraclePath(name: String): String =
    graft.OracleSidecar.sqlPath(name)

  // ------------------------------------------------------------ dedup
  private val dedupExact = NamedQuery(
    "dedup_exact",
    (s, d) =>
      Dedup.exact(Tables.documents(s, d))
        .orderBy(col("fingerprint")),
    Some(s"""SELECT md5($normSql) AS fingerprint,
                    min(doc_id) AS keep_id, count(*) AS n_copies
             FROM documents GROUP BY 1 ORDER BY 1"""))

  /** Exact 3-gram Jaccard pair set at threshold 0.8 in DuckDB — the ground
    * truth both for `dedup_ngram_jaccard` itself and for the MinHash+LSH
    * recall gate (`dedup_minhash_lsh`), whose exact-verified output must
    * reproduce this set value-for-value on the driver corpus.
    */
  private val ngramPairsOracle =
    s"""WITH tok AS (SELECT doc_id, string_split($normSql, ' ') AS l FROM documents),
        sh AS (SELECT doc_id,
                      CASE WHEN len(l) < 3 THEN [array_to_string(l, ' ')]
                           ELSE list_distinct([array_to_string(l[i:i+2], ' ')
                                               FOR i IN range(1, len(l) - 1)])
                      END AS ss
               FROM tok),
        ex AS (SELECT doc_id, len(ss) AS ns, unnest(ss) AS s FROM sh),
        pairs AS (SELECT a.doc_id AS doc1, b.doc_id AS doc2,
                         a.ns AS n1, b.ns AS n2, count(*) AS common
                  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
                  GROUP BY 1, 2, 3, 4)
        SELECT doc1, doc2,
               round(common * 1.0 / (n1 + n2 - common), 4) AS jaccard
        FROM pairs WHERE common * 1.0 / (n1 + n2 - common) >= 0.8
        ORDER BY doc1, doc2"""

  private val dedupNgram = NamedQuery(
    "dedup_ngram_jaccard",
    (s, d) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, d), n = 3, threshold = 0.8)
        .orderBy(col("doc1"), col("doc2")),
    Some(ngramPairsOracle))

  /** The scale-robust variant: candidates only from shingles with df ≤ 20
    * (stop-shingle skew cap), Jaccard exact-verified on full sets.
    */
  private val dedupNgramCapped = NamedQuery(
    "dedup_ngram_capped",
    (s, d) =>
      Dedup.ngramJaccardPairsCapped(Tables.documents(s, d), n = 3,
          threshold = 0.8, maxShingleDf = 20)
        .orderBy(col("doc1"), col("doc2")),
    Some(s"""WITH tok AS (SELECT doc_id, string_split($normSql, ' ') AS l FROM documents),
             sh AS (SELECT doc_id,
                           CASE WHEN len(l) < 3 THEN [array_to_string(l, ' ')]
                                ELSE list_distinct([array_to_string(l[i:i+2], ' ')
                                                    FOR i IN range(1, len(l) - 1)])
                           END AS ss
                    FROM tok),
             ex AS (SELECT doc_id, unnest(ss) AS s FROM sh),
             rare_s AS (SELECT s FROM ex GROUP BY s HAVING count(*) <= 20),
             rare AS (SELECT ex.doc_id, ex.s FROM ex JOIN rare_s USING (s)),
             cand AS (SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
                      FROM rare a JOIN rare b
                        ON a.s = b.s AND a.doc_id < b.doc_id),
             v AS (SELECT doc1, doc2,
                          len(list_intersect(s1.ss, s2.ss)) AS common,
                          len(s1.ss) AS n1, len(s2.ss) AS n2
                   FROM cand
                   JOIN sh s1 ON cand.doc1 = s1.doc_id
                   JOIN sh s2 ON cand.doc2 = s2.doc_id)
             SELECT doc1, doc2,
                    round(common * 1.0 / (n1 + n2 - common), 4) AS jaccard
             FROM v WHERE common * 1.0 / (n1 + n2 - common) >= 0.8
             ORDER BY doc1, doc2"""))

  /** Asymmetric containment near-dup (Broder): |S(A)∩S(B)|/|S(A)| ≥ 0.9
    * with A the smaller shingle-set side — flags doc-in-doc inclusion the
    * symmetric Jaccard ops are blind to. Exact-verified on full shingle
    * sets (df-capped candidates), so the oracle reproduces it
    * value-for-value.
    */
  private val dedupContainment = NamedQuery(
    "dedup_containment",
    (s, d) =>
      Dedup.containmentPairs(Tables.documents(s, d), n = 3,
          threshold = 0.9, maxShingleDf = 20)
        .orderBy(col("contained"), col("container")),
    Some(s"""WITH tok AS (SELECT doc_id, string_split($normSql, ' ') AS l FROM documents),
             sh AS (SELECT doc_id,
                           CASE WHEN len(l) < 3 THEN [array_to_string(l, ' ')]
                                ELSE list_distinct([array_to_string(l[i:i+2], ' ')
                                                    FOR i IN range(1, len(l) - 1)])
                           END AS ss
                    FROM tok),
             ex AS (SELECT doc_id, unnest(ss) AS s FROM sh),
             rare_s AS (SELECT s FROM ex GROUP BY s HAVING count(*) <= 20),
             rare AS (SELECT ex.doc_id, ex.s FROM ex JOIN rare_s USING (s)),
             cand AS (SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
                      FROM rare a JOIN rare b
                        ON a.s = b.s AND a.doc_id < b.doc_id),
             v AS (SELECT doc1, doc2,
                          len(list_intersect(s1.ss, s2.ss)) AS common,
                          len(s1.ss) AS n1, len(s2.ss) AS n2
                   FROM cand
                   JOIN sh s1 ON cand.doc1 = s1.doc_id
                   JOIN sh s2 ON cand.doc2 = s2.doc_id)
             SELECT CASE WHEN n1 <= n2 THEN doc1 ELSE doc2 END AS contained,
                    CASE WHEN n1 <= n2 THEN doc2 ELSE doc1 END AS container,
                    round(common * 1.0 / least(n1, n2), 4) AS containment
             FROM v WHERE common * 1.0 / least(n1, n2) >= 0.9
             ORDER BY contained, container"""))

  /** MinHash+LSH, hash-gated against the exact-Jaccard oracle: emitted
    * pairs are exact-verified (so false positives are impossible and the
    * jaccard values are bit-identical to the oracle's), and at b=32/r=2 the
    * S-curve miss probability at J ≥ 0.8 is (1−J²)³² < 1e-13 per pair, so
    * the pair SET equals the exact set (verified at sf0.001/0.01/0.1 —
    * the sf0.1 check is what exposed the missing mod-P reduction in the
    * MinHashSig kernel: 0.98-Jaccard pairs were missing at a ~2% rate
    * before that fix, see TextExpressions.scala).
    *
    * The one assumption the S-curve bound does NOT cover: maxBucket drops
    * buckets with more members than the cap, so a near-dup CLUSTER bigger
    * than the cap would be missed deterministically. The corpus family's
    * largest cluster is ≪ 64; the gate runs with maxBucket=256 for
    * margin. A corpus with bigger clusters needs the cap raised for
    * oracle parity — that is the documented recall trade, not a bug.
    */
  private val dedupMinhash = NamedQuery(
    "dedup_minhash_lsh",
    (s, d) =>
      Dedup.minhashLshPairs(Tables.documents(s, d), n = 3, threshold = 0.8,
          maxBucket = 256)
        .orderBy(col("doc1"), col("doc2")),
    Some(ngramPairsOracle))

  /** SimHash near-dup pairs, fully hash-gated via materialized signatures:
    * the seeded SimHash kernel is the only non-SQL-expressible step, so the
    * query materializes its (doc_id, sig) table and the oracle recomputes
    * the ENTIRE pair stage brute-force in DuckDB — all O(n²) pairs with
    * `bit_count(xor(s1, s2)) <= 6` over the stored longs. That gates the
    * block-trick join's losslessness (blocks=8 > maxHamming=6 ⇒ pigeonhole
    * guarantees a colliding block), the hamming arithmetic, and the
    * candidate dedup value-for-value; the kernel itself is pinned
    * bit-for-bit against its independent HOF reference in ScalaTest.
    * (Brute force is fine for the ORACLE at sf0.01 — the Spark side never
    * materializes the pair space.)
    */
  private val dedupSimhash = NamedQuery(
    "dedup_simhash",
    (s, d) => {
      val sigs = Dedup.simhashSignatures(Tables.documents(s, d))
        .localCheckpoint(eager = false)
      materializeForOracle(sigs, d, "simhash_sigs")
      Dedup.simhashPairsFromSigs(sigs, maxHamming = 6)
        .orderBy(col("doc1"), col("doc2"))
    },
    Some(s"""WITH sg AS (SELECT doc_id, sig
                         FROM read_parquet('${oraclePath("simhash_sigs")}'))
             SELECT a.doc_id AS doc1, b.doc_id AS doc2,
                    CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
             FROM sg a JOIN sg b ON a.doc_id < b.doc_id
             WHERE bit_count(xor(a.sig, b.sig)) <= 6
             ORDER BY doc1, doc2"""))

  /** Bounded PRODUCTION serve of the simhash pair stage (r14 — the capped
    * twin the sf100 probe demanded; gate 201): the block trick's bucket
    * alphabet is fixed at 2,048 (blk, chunk) values, so bucket joins go
    * quadratic once the corpus dwarfs it — measured 76.5×/decade at
    * sf100 after two decades inside the linear band. The serve decides a
    * per-bucket pair budget (cap 10 — inside the sf0.01 bucket-size
    * spread of 1..9 rows via n·(n−1)/2 > cap, so the oracle exercises
    * cull AND exact-join branches together: 39 buckets culled, 1,690
    * served at sf0.01) from ONE narrow count BEFORE the join and emits a
    * certificate per occupied bucket, output bounded by the alphabet.
    * The oracle recomputes buckets, budgets, and capped hamming joins
    * brute-force in SQL from the materialized signature sidecar — the
    * same contract as dedup_simhash, extended to the cull decision.
    */
  private val dedupSimhashCapped = NamedQuery(
    "dedup_simhash_capped",
    (s, d) => {
      val sigs = Dedup.simhashSignatures(Tables.documents(s, d))
        .localCheckpoint(eager = false)
      materializeForOracle(sigs, d, "simhash_capped_sigs")
      Dedup.simhashCertificates(sigs, maxHamming = 6, blocks = 8,
        maxPairsPerBucket = 10L)
        .orderBy(col("blk"), col("chunk"))
    },
    Some(s"""WITH sg AS (SELECT doc_id, sig
                         FROM read_parquet('${oraclePath("simhash_capped_sigs")}')),
             blocked AS (SELECT doc_id, sig, b.blk,
                                (sig >> (b.blk * 8)) & 255 AS chunk
                         FROM sg, (SELECT unnest(range(8)) AS blk) b),
             c AS (SELECT blk, chunk, count(*) AS n_rows
                   FROM blocked GROUP BY 1, 2),
             cc AS (SELECT blk, chunk, n_rows,
                           n_rows * (n_rows - 1) > 20 AS culled
                    FROM c),
             kept AS (SELECT bl.doc_id, bl.sig, bl.blk, bl.chunk
                      FROM blocked bl JOIN cc USING (blk, chunk)
                      WHERE NOT cc.culled),
             p AS (SELECT a.blk, a.chunk, count(*) AS n_pairs
                   FROM kept a JOIN kept b
                     ON a.blk = b.blk AND a.chunk = b.chunk
                        AND a.doc_id < b.doc_id
                   WHERE bit_count(xor(a.sig, b.sig)) <= 6
                   GROUP BY 1, 2)
             SELECT CAST(cc.blk AS INT) AS blk, cc.chunk,
                    CAST(cc.n_rows AS BIGINT) AS n_rows, cc.culled,
                    CAST(coalesce(p.n_pairs, 0) AS BIGINT) AS n_pairs
             FROM cc LEFT JOIN p USING (blk, chunk)
             ORDER BY blk, chunk"""))

  /** Containment gate for SimHash (the VERDICT's driver-verifiable
    * companion): every hamming ≤ 6 pair must be a GENUINE near-dup — exact
    * shingle Jaccard ≥ 0.3 (the observed minimum on the corpus family is
    * ≥ 0.8; the bar sits far below it so a legitimate borderline simhash
    * candidate on a future corpus doesn't false-alarm, while a regression
    * that lets unrelated pairs through the block-trick join or the
    * signature kernel — those arrive at J ≈ 0 — still turns this red).
    * The query emits the violations, so the expected — and hash-verified —
    * result is EMPTY. Recall (the other direction) is
    * hamming-metric-defined and spec-pinned (DedupSpec planted corpus).
    * Cost: Jaccard is exact-verified for the |pairs| candidates only, same
    * join shape as minhashLshPairs' verify stage — scale-safe.
    */
  private val dedupSimhashContained = NamedQuery(
    "dedup_simhash_contained",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val sh = Dedup.minhashLshShingleStore(docs, n = 3)
      Dedup.simhashPairs(docs, maxHamming = 6)
        .join(sh.select(col("doc_id").as("doc1"), col("ss").as("ss1")), "doc1")
        .join(sh.select(col("doc_id").as("doc2"), col("ss").as("ss2")), "doc2")
        .withColumn("common",
          graft.plans.GraftColumns.sortedIntersectSize(col("ss1"), col("ss2")))
        .withColumn("jaccard",
          col("common").cast("double") /
            (size(col("ss1")) + size(col("ss2")) - col("common")))
        .filter(col("jaccard") < 0.3)
        .select(col("doc1"), col("doc2"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("doc1"), col("doc2"))
    },
    Some("""SELECT CAST(NULL AS BIGINT) AS doc1, CAST(NULL AS BIGINT) AS doc2,
                   CAST(NULL AS DOUBLE) AS jaccard
            WHERE false"""))

  /** The incremental near-dup surface through the driver gate: LSH-index
    * the corpus (doc_id % 19 != 0) once, probe the "new batch"
    * (doc_id % 19 = 0) against it — the daily operation of a streaming
    * curation pipeline. Exact-verify contract ⇒ emitted (new, indexed)
    * pairs must equal DuckDB's exact cross-set Jaccard ≥ 0.8 pairs
    * (verified equal at sf0.001/0.01/0.1; same maxBucket margin note as
    * dedup_minhash_lsh above).
    */
  private val dedupIncrementalProbe = NamedQuery(
    "dedup_incremental_probe",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val batch = docs.filter(col("doc_id") % 19 === 0)
      val corpus = docs.filter(col("doc_id") % 19 =!= 0)
      Dedup.minhashLshProbe(
          batch,
          Dedup.minhashLshIndex(corpus, n = 3),
          Dedup.minhashLshShingleStore(corpus, n = 3),
          n = 3, threshold = 0.8, maxBucket = 256)
        .orderBy(col("doc1"), col("doc2"))
    },
    Some(s"""WITH tok AS (SELECT doc_id, string_split($normSql, ' ') AS l FROM documents),
             sh AS (SELECT doc_id,
                           CASE WHEN len(l) < 3 THEN [array_to_string(l, ' ')]
                                ELSE list_distinct([array_to_string(l[i:i+2], ' ')
                                                    FOR i IN range(1, len(l) - 1)])
                           END AS ss
                    FROM tok),
             ex AS (SELECT doc_id, len(ss) AS ns, unnest(ss) AS s FROM sh),
             newb AS (SELECT * FROM ex WHERE doc_id % 19 = 0),
             idx AS (SELECT * FROM ex WHERE doc_id % 19 <> 0),
             pairs AS (SELECT newb.doc_id AS doc1, idx.doc_id AS doc2,
                              newb.ns AS n1, idx.ns AS n2, count(*) AS common
                       FROM newb JOIN idx ON newb.s = idx.s
                       GROUP BY 1, 2, 3, 4)
             SELECT doc1, doc2,
                    round(common * 1.0 / (n1 + n2 - common), 4) AS jaccard
             FROM pairs WHERE common * 1.0 / (n1 + n2 - common) >= 0.8
             ORDER BY doc1, doc2"""))

  private val dedupEmbedding = NamedQuery(
    "dedup_embedding_cosine",
    (s, d) =>
      Dedup.embeddingCosinePairs(Tables.embeddings(s, d), threshold = 0.4)
        .orderBy(col("id1"), col("id2")),
    // DOUBLE[]-cast cosine (r13): DuckDB's FLOAT[] list_cosine_similarity
    // accumulates in float, landing within ~1e-7 of the engine's
    // float->double sequential kernel — close enough that at sf1 five of
    // 9,583 rows sat within 5.2e-8 of the .00005 rounding boundary and
    // flipped round(cos, 4). Casting the lists to DOUBLE[] makes DuckDB's
    // accumulation bit-identical to vec_dot (same element order, same
    // widened operands): verified 0 diff cells at sf1.
    Some("""SELECT a.vec_id AS id1, b.vec_id AS id2,
                   round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])), 4) AS cos
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.4
            ORDER BY 1, 2"""))

  /** Bounded production serve of dedup_embedding_cosine (the pattern
    * q28_interval_overlap_capped set): the exact label-blocked pair join
    * is quadratic in the hottest label (fixed alphabet ⇒ block size grows
    * linearly with the corpus), so the serve decides a per-block pair
    * budget from a NARROW per-label count BEFORE the join, culls dense
    * labels without ever performing their quadratic work, and emits one
    * certificate row per label — (block, n_rows, culled, n_pairs) with
    * n_pairs exact on every surviving label. Cap 1200 sits inside the
    * sf0.01 label-size spread (44–59 rows ⇒ 946–1711 pairs), so the
    * oracle exercises BOTH branches: labels of ≤49 rows survive with
    * exact counts, larger ones cull. Output is bounded by the label
    * alphabet — flat at any sf.
    */
  private val dedupEmbeddingCapped = NamedQuery(
    "dedup_embedding_cosine_capped",
    (s, d) =>
      Dedup.embeddingCosineCertificates(Tables.embeddings(s, d),
          threshold = 0.4, maxPairsPerBlock = 1200L)
        .orderBy(col("block")),
    Some("""WITH c AS (SELECT label AS block, count(*) AS n_rows
                       FROM embeddings GROUP BY 1),
                 cert AS (SELECT block, n_rows,
                                 n_rows * (n_rows - 1) > 2 * 1200 AS culled
                          FROM c),
                 p AS (SELECT a.label AS block, count(*) AS n_pairs
                       FROM embeddings a JOIN embeddings b
                         ON a.label = b.label AND a.vec_id < b.vec_id
                       WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])) >= 0.4
                         AND a.label NOT IN (SELECT block FROM cert WHERE culled)
                       GROUP BY 1)
            SELECT c2.block, c2.n_rows, c2.culled,
                   coalesce(p.n_pairs, 0) AS n_pairs
            FROM cert c2 LEFT JOIN p USING (block) ORDER BY block"""))

  // ------------------------------------------------------- similarity
  /** Exact cosine top-10 for queries 0/1/2 in DuckDB — ground truth for
    * brute force AND for the two exhaustive-probe ANN recall gates, which
    * must reproduce it exactly.
    */
  private val topkOracle =
    """WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                  FROM embeddings WHERE vec_id IN (0, 1, 2)),
       s AS (SELECT query_id, vec_id AS neighbor_id,
                    list_cosine_similarity(qv, embedding) AS cos
             FROM embeddings, q WHERE vec_id <> query_id),
       r AS (SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor_id) AS rank FROM s)
       SELECT query_id, neighbor_id, round(CAST(cos AS DOUBLE), 4) AS cos, rank
       FROM r WHERE rank <= 10 ORDER BY query_id, rank"""

  /** MMR diversified re-rank of vec 0's top-25 pool (λ=0.7, k=5): the
    * redundancy-suppressing stage between retrieval and serving. The
    * oracle replays the EXACT greedy — pool, seed, and every conditional
    * argmax — as a recursive CTE accumulating the selection list, so a
    * wrong pool cut, a wrong seed tiebreak, or any divergence in the
    * marginal-score comparison at any step breaks the hash. (1−λ) is
    * written as the expression `(1.0 − 0.7)` on BOTH engines — the folded
    * double differs from the literal 0.3 in the last ulp — and the greedy
    * compares marginal scores at the PINNED round-12 scale on both
    * engines, so ulp drift between the vec_dot kernel and DuckDB's
    * list_cosine_similarity can never flip a near-tied pick on one
    * engine only.)
    */
  private val simMmr = NamedQuery(
    "sim_mmr_rerank",
    (s, d) =>
      Similarity.mmrRerank(Tables.embeddings(s, d), queryId = 0L,
        pool = 25, k = 5, lambda = 0.7),
    Some("""WITH RECURSIVE
            q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
            cand AS (SELECT vec_id AS id,
                            list_cosine_similarity(qv, embedding) AS rel
                     FROM embeddings, q WHERE vec_id <> 0
                     ORDER BY rel DESC, vec_id LIMIT 25),
            ps AS (SELECT a.id AS a, b.id AS b,
                          list_cosine_similarity(ea.embedding, eb.embedding)
                            AS s
                   FROM cand a JOIN cand b ON a.id <> b.id
                   JOIN embeddings ea ON ea.vec_id = a.id
                   JOIN embeddings eb ON eb.vec_id = b.id),
            seed AS (SELECT id FROM cand
                     ORDER BY round(CAST(rel AS DOUBLE), 12) DESC, id
                     LIMIT 1),
            sel AS (SELECT 1 AS it, [(SELECT id FROM seed)] AS ids
                    UNION ALL
                    SELECT it + 1, list_append(ids, (
                      SELECT c.id FROM cand c
                      WHERE NOT list_contains(ids, c.id)
                      ORDER BY round(CAST(0.7 * c.rel - (1.0 - 0.7) * (
                          SELECT max(s) FROM ps
                          WHERE ps.a = c.id AND list_contains(ids, ps.b))
                          AS DOUBLE), 12)
                        DESC, c.id
                      LIMIT 1))
                    FROM sel WHERE it < 5),
            fin AS (SELECT ids FROM sel WHERE it = 5),
            ex AS (SELECT unnest([{'rank': i, 'vec_id': ids[i]}
                                  FOR i IN range(1, len(ids) + 1)],
                                 recursive := true)
                   FROM fin)
            SELECT CAST(ex.rank AS INTEGER) AS rank, ex.vec_id,
                   round(CAST(c.rel AS DOUBLE), 4) AS rel
            FROM ex JOIN cand c ON c.id = ex.vec_id
            ORDER BY ex.rank"""))

  /** Matryoshka (MRL) truncated-embedding retrieval: exact top-10 by
    * cosine over the FIRST 16 of 64 dims — the modern serve-cheap/
    * rerank-rich embedding pattern (truncate the representation, keep the
    * metric). Slicing happens before norms, so the score is a true
    * 16-dim cosine, not a projected 64-dim one; ranking/tiebreak reuse
    * the exact top-k discipline. 100 TB read: a 4× narrower candidate
    * scan for the first pass, full-dim rerank only on survivors (the
    * rerank stage is `sim_topk_bruteforce`'s existing path).
    */
  private val simMatryoshka = NamedQuery(
    "sim_matryoshka_topk",
    (s, d) => {
      graft.plans.GraftFunctions.ensure(s)
      import graft.functions.VectorFunctions.{dotFast, norm2Fast}
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), slice(col("embedding"), 1, 16).as("e16"))
      val q = emb.filter(col("vec_id").isin(0L, 1L, 2L))
        .select(col("vec_id").as("query_id"), col("e16").as("qv"),
          norm2Fast(col("e16")).as("qn"))
      val c = emb.select(col("vec_id").as("neighbor_id"), col("e16").as("cv"),
        norm2Fast(col("e16")).as("cn"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      c.crossJoin(broadcast(q))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("cos", dotFast(col("qv"), col("cv")) /
          (col("qn") * col("cn")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 4).as("cos"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""WITH q AS (SELECT vec_id AS query_id, embedding[1:16] AS qv
                       FROM embeddings WHERE vec_id IN (0, 1, 2)),
            sc AS (SELECT query_id, vec_id AS neighbor_id,
                          list_cosine_similarity(qv, embedding[1:16]) AS cos
                   FROM embeddings, q WHERE vec_id <> query_id),
            r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY cos DESC, neighbor_id) AS rank FROM sc)
            SELECT query_id, neighbor_id,
                   round(CAST(cos AS DOUBLE), 4) AS cos, rank
            FROM r WHERE rank <= 10 ORDER BY query_id, rank"""))

  private val simTopK = NamedQuery(
    "sim_topk_bruteforce",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(
          emb, emb.filter(col("vec_id").isin(0L, 1L, 2L)), k = 10)
        .orderBy(col("query_id"), col("rank"))
    },
    Some(topkOracle))

  /** Production ANN point: 7 OR-amplified tables × 8 bits with 2-bit
    * multi-probe — measured 93-97% recall@10 on the driver corpus family
    * (RecallProbe) vs 7-20% for a single 8-bit table, probing ~14% of the
    * bucket space. Fully hash-gated via materialized signatures: the query
    * materializes the 56-bit hyperplane signature per vector (the one
    * seeded-hash step), and the oracle re-derives the candidate set in
    * DuckDB from first principles — a corpus row is a candidate iff its
    * 8-bit chunk is within hamming 2 of the query's chunk in ANY of the 7
    * tables, which is exactly what the probe-mask expansion enumerates —
    * then scores and ranks independently. A bug in the probe expansion,
    * table slicing, bucket join, candidate dedup, or ranking breaks the
    * hash; the signature kernel itself is pinned bit-for-bit against its
    * HOF reference in VectorExpressionsSpec. (The 56-bit signature has no
    * sign bit set, so DuckDB's `>>` and Spark's shiftrightunsigned agree.)
    */
  private val simAnn = NamedQuery(
    "sim_ann_lsh",
    (s, d) => {
      graft.plans.GraftFunctions.ensure(s)
      val emb = Tables.embeddings(s, d)
      materializeForOracle(
        emb.select(col("vec_id"),
          graft.functions.VectorFunctions
            .hyperplaneSignature(col("embedding"), 56).as("sig")),
        d, "lsh_sigs")
      Similarity.lshTopKMulti(
          emb, emb.filter(col("vec_id").isin(0L, 1L, 2L)), k = 10,
          nBits = 8, nTables = 7, maxHamming = 2)
        .orderBy(col("query_id"), col("rank"))
    },
    Some {
      val hit = (0 until 7).map { t =>
        val sh = t * 8
        s"bit_count(xor((q.sig >> $sh) & 255, (c.sig >> $sh) & 255)) <= 2"
      }.mkString("(", "\n                OR ", ")")
      s"""WITH sg AS (SELECT vec_id, sig
                      FROM read_parquet('${oraclePath("lsh_sigs")}')),
          q AS (SELECT e.vec_id AS query_id, e.embedding AS qv, sg.sig
                FROM embeddings e JOIN sg USING (vec_id)
                WHERE e.vec_id IN (0, 1, 2)),
          c AS (SELECT e.vec_id AS neighbor_id, e.embedding AS cv, sg.sig
                FROM embeddings e JOIN sg USING (vec_id)),
          sc AS (SELECT q.query_id, c.neighbor_id,
                        list_cosine_similarity(q.qv, c.cv) AS cos
                 FROM q JOIN c ON c.neighbor_id <> q.query_id AND $hit),
          r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, neighbor_id) AS rank FROM sc)
          SELECT query_id, neighbor_id, round(CAST(cos AS DOUBLE), 4) AS cos,
                 rank
          FROM r WHERE rank <= 10 ORDER BY query_id, rank"""
    })

  /** Production IVF point (4 of 16 cells probed), fully hash-gated via the
    * materialized seed table: seed SELECTION (smallest xxhash64(id)) is the
    * one non-SQL-expressible step, so the query materializes the 16
    * (cell_id, cv, cn2) seed rows and the oracle re-derives EVERYTHING
    * downstream in DuckDB — corpus→cell argmin assignment (rank by
    * cn2 − 2·⟨v,cv⟩ with the same (d2, cell_id) tie order), the query's
    * nProbe=4 probe cells, the per-cell candidate join, scoring, ranking.
    * Embedding lists are cast to DOUBLE[] so DuckDB's inner product
    * accumulates in double like the codegen vec_dot kernel; cn2 comes from
    * the stored table, not recomputation, so both engines rank against the
    * identical constant.
    */
  private val simIvf = NamedQuery(
    "sim_ann_ivf",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      materializeForOracle(Similarity.ivfSeeds(emb, nCells = 16),
        d, "ivf_seeds")
      Similarity.ivfTopK(
          emb, emb.filter(col("vec_id").isin(0L, 1L, 2L)), k = 10,
          nCells = 16, nProbe = 4)
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""WITH sd AS (SELECT cell_id, cv, cn2
                         FROM read_parquet('${oraclePath("ivf_seeds")}')),
             assigned AS (
               SELECT neighbor_id, v, cell_id AS cell FROM (
                 SELECT e.vec_id AS neighbor_id, e.embedding AS v, s.cell_id,
                        row_number() OVER (PARTITION BY e.vec_id
                          ORDER BY s.cn2 - 2 * list_inner_product(
                            CAST(e.embedding AS DOUBLE[]),
                            CAST(s.cv AS DOUBLE[])), s.cell_id) AS rn
                 FROM embeddings e, sd s) WHERE rn = 1),
             probes AS (
               SELECT query_id, qv, cell_id AS probe_cell FROM (
                 SELECT e.vec_id AS query_id, e.embedding AS qv, s.cell_id,
                        row_number() OVER (PARTITION BY e.vec_id
                          ORDER BY s.cn2 - 2 * list_inner_product(
                            CAST(e.embedding AS DOUBLE[]),
                            CAST(s.cv AS DOUBLE[])), s.cell_id) AS rn
                 FROM embeddings e, sd s
                 WHERE e.vec_id IN (0, 1, 2)) WHERE rn <= 4),
             sc AS (SELECT p.query_id, a.neighbor_id,
                           list_cosine_similarity(p.qv, a.v) AS cos
                    FROM probes p JOIN assigned a ON p.probe_cell = a.cell
                    WHERE a.neighbor_id <> p.query_id),
             r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY cos DESC, neighbor_id) AS rank FROM sc)
             SELECT query_id, neighbor_id,
                    round(CAST(cos AS DOUBLE), 4) AS cos, rank
             FROM r WHERE rank <= 10 ORDER BY query_id, rank"""))

  /** Recall gates for the two ANN operators. The production points above
    * are hash-gated through their materialized signatures/seeds; the
    * EXHAUSTIVE parameter points below are gated WITHOUT any materialized
    * side input because they have PROVABLE recall 1.0 — maxHamming = nBits
    * probes every one of the 2^8 buckets, nProbe = nCells probes every
    * cell — so each must reproduce the exact brute-force top-k, and a bug
    * anywhere in the machinery (signature kernel, probe expansion, bucket/
    * cell join, candidate dedup, ranking, cosine arithmetic) breaks the
    * hash against DuckDB's independently-computed top-k.
    */
  private val simLshExhaustive = NamedQuery(
    "sim_ann_lsh_exhaustive",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.lshTopK(
          emb, emb.filter(col("vec_id").isin(0L, 1L, 2L)), k = 10,
          nBits = 8, maxHamming = 8)
        .orderBy(col("query_id"), col("rank"))
    },
    Some(topkOracle))

  private val simIvfExhaustive = NamedQuery(
    "sim_ann_ivf_exhaustive",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfTopK(
          emb, emb.filter(col("vec_id").isin(0L, 1L, 2L)), k = 10,
          nCells = 16, nProbe = 16)
        .orderBy(col("query_id"), col("rank"))
    },
    Some(topkOracle))

  /** Production PQ point: 8 subspaces × 32 sample centroids, 100-candidate
    * exact re-rank — 29/30 recall@10 on the driver corpus family (PqProbe
    * sweep; random vectors are the adversarial case, no cluster structure
    * to exploit) while the codes table is 32× smaller than the raw vectors
    * (8 bytes vs 256), which is what makes the candidate scan affordable
    * when the corpus no longer fits as full-precision floats. Fully
    * hash-gated via the materialized codebook: seed SELECTION (smallest
    * xxhash64(id)) is the one non-SQL-expressible step, so the query
    * materializes the flat (j, i, sv, n2) codebook and the oracle
    * re-derives EVERYTHING downstream in DuckDB — per-subspace argmin
    * encode (rank by n2 − 2·⟨x_j,c⟩ with the same (d2, i) tie order), the
    * query LUTs, the ADC approximate-cosine scan, the rerank-100 candidate
    * cut, and the exact re-score + top-k. A bug in encode, LUT indexing,
    * ADC accumulation, candidate ranking, or re-rank breaks the hash; the
    * recall floor stays spec-pinned in SimilaritySpec/PropertySpec.
    */
  private val simPq = NamedQuery(
    "sim_ann_pq",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      materializeForOracle(
        Similarity.pqCodebook(emb, dims = 64, m = 8, ksub = 32),
        d, "pq_codebook")
      Similarity.pqTopK(
          emb, emb.filter(col("vec_id").isin(0L, 1L, 2L)), k = 10,
          dims = 64, m = 8, ksub = 32, rerank = 100)
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""WITH cb AS (SELECT j, i, CAST(sv AS DOUBLE[]) AS sv, n2
                         FROM read_parquet('${oraclePath("pq_codebook")}')),
             codes AS (
               SELECT neighbor_id, j, i AS code FROM (
                 SELECT e.vec_id AS neighbor_id, c.j, c.i,
                        row_number() OVER (PARTITION BY e.vec_id, c.j
                          ORDER BY c.n2 - 2 * list_inner_product(
                            CAST(e.embedding[c.j*8+1 : c.j*8+8] AS DOUBLE[]),
                            c.sv), c.i) AS rn
                 FROM embeddings e, cb c) WHERE rn = 1),
             cn AS (SELECT vec_id AS neighbor_id,
                           sqrt(list_inner_product(
                             CAST(embedding AS DOUBLE[]),
                             CAST(embedding AS DOUBLE[]))) AS cn
                    FROM embeddings),
             q AS (SELECT vec_id AS query_id, embedding AS qv,
                          sqrt(list_inner_product(
                            CAST(embedding AS DOUBLE[]),
                            CAST(embedding AS DOUBLE[]))) AS qn
                   FROM embeddings WHERE vec_id IN (0, 1, 2)),
             lut AS (SELECT q.query_id, c.j, c.i,
                            list_inner_product(
                              CAST(q.qv[c.j*8+1 : c.j*8+8] AS DOUBLE[]),
                              c.sv) AS d
                     FROM q, cb c),
             adc AS (SELECT l.query_id, cd.neighbor_id, sum(l.d) AS adot
                     FROM codes cd
                     JOIN lut l ON l.j = cd.j AND l.i = cd.code
                     WHERE cd.neighbor_id <> l.query_id
                     GROUP BY 1, 2),
             cand AS (SELECT query_id, neighbor_id FROM (
                        SELECT a.query_id, a.neighbor_id,
                               row_number() OVER (PARTITION BY a.query_id
                                 ORDER BY a.adot / (q.qn * cn.cn) DESC,
                                          a.neighbor_id) AS arank
                        FROM adc a
                        JOIN q ON q.query_id = a.query_id
                        JOIN cn ON cn.neighbor_id = a.neighbor_id)
                      WHERE arank <= 100),
             sc AS (SELECT c.query_id, c.neighbor_id,
                           list_cosine_similarity(q.qv, e.embedding) AS cos
                    FROM cand c
                    JOIN q ON q.query_id = c.query_id
                    JOIN embeddings e ON e.vec_id = c.neighbor_id),
             r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY cos DESC, neighbor_id) AS rank FROM sc)
             SELECT query_id, neighbor_id,
                    round(CAST(cos AS DOUBLE), 4) AS cos, rank
             FROM r WHERE rank <= 10 ORDER BY query_id, rank"""))

  /** Composed IVF-PQ production point (4 of 16 cells probed × 8-byte
    * codes × rerank-100 exact re-rank) — the two ANN halves the inventory
    * already hash-gates separately, now composed into the standard
    * production index shape and hash-gated END TO END. Both seeded-hash
    * steps materialize (the 16-row IVF seed table and the flat PQ
    * codebook, under ivfpq_* names so this gate never races the
    * single-index gates' sidecars), and the oracle re-derives the WHOLE
    * cascade in DuckDB: corpus→cell argmin assignment, the query's
    * nProbe=4 probe cells, per-subspace argmin encode, query LUTs, the
    * ADC scan RESTRICTED to probed cells (the composition point — a
    * candidate from an unprobed cell, or a probed-cell candidate missing
    * from the scan, breaks the hash), the rerank-100 cut, and the exact
    * re-score + top-k. The equality identities (nProbe = nCells ⇒ pqTopK;
    * rerank ≥ corpus ⇒ ivfTopK) and the production recall floor are
    * SimilaritySpec-pinned.
    */
  private val simIvfPq = NamedQuery(
    "sim_ann_ivfpq",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      materializeForOracle(Similarity.ivfSeeds(emb, nCells = 16),
        d, "ivfpq_seeds")
      materializeForOracle(
        Similarity.pqCodebook(emb, dims = 64, m = 8, ksub = 32),
        d, "ivfpq_codebook")
      Similarity.ivfPqTopK(
          emb, emb.filter(col("vec_id").isin(0L, 1L, 2L)), k = 10,
          nCells = 16, nProbe = 4, dims = 64, m = 8, ksub = 32, rerank = 100)
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""WITH sd AS (SELECT cell_id, cv, cn2
                         FROM read_parquet('${oraclePath("ivfpq_seeds")}')),
             cb AS (SELECT j, i, CAST(sv AS DOUBLE[]) AS sv, n2
                    FROM read_parquet('${oraclePath("ivfpq_codebook")}')),
             assigned AS (
               SELECT neighbor_id, cell_id AS cell FROM (
                 SELECT e.vec_id AS neighbor_id, s.cell_id,
                        row_number() OVER (PARTITION BY e.vec_id
                          ORDER BY s.cn2 - 2 * list_inner_product(
                            CAST(e.embedding AS DOUBLE[]),
                            CAST(s.cv AS DOUBLE[])), s.cell_id) AS rn
                 FROM embeddings e, sd s) WHERE rn = 1),
             probes AS (
               SELECT query_id, cell_id AS probe_cell FROM (
                 SELECT e.vec_id AS query_id, s.cell_id,
                        row_number() OVER (PARTITION BY e.vec_id
                          ORDER BY s.cn2 - 2 * list_inner_product(
                            CAST(e.embedding AS DOUBLE[]),
                            CAST(s.cv AS DOUBLE[])), s.cell_id) AS rn
                 FROM embeddings e, sd s
                 WHERE e.vec_id IN (0, 1, 2)) WHERE rn <= 4),
             codes AS (
               SELECT neighbor_id, j, i AS code FROM (
                 SELECT e.vec_id AS neighbor_id, c.j, c.i,
                        row_number() OVER (PARTITION BY e.vec_id, c.j
                          ORDER BY c.n2 - 2 * list_inner_product(
                            CAST(e.embedding[c.j*8+1 : c.j*8+8] AS DOUBLE[]),
                            c.sv), c.i) AS rn
                 FROM embeddings e, cb c) WHERE rn = 1),
             cn AS (SELECT vec_id AS neighbor_id,
                           sqrt(list_inner_product(
                             CAST(embedding AS DOUBLE[]),
                             CAST(embedding AS DOUBLE[]))) AS cn
                    FROM embeddings),
             q AS (SELECT vec_id AS query_id, embedding AS qv,
                          sqrt(list_inner_product(
                            CAST(embedding AS DOUBLE[]),
                            CAST(embedding AS DOUBLE[]))) AS qn
                   FROM embeddings WHERE vec_id IN (0, 1, 2)),
             lut AS (SELECT q.query_id, c.j, c.i,
                            list_inner_product(
                              CAST(q.qv[c.j*8+1 : c.j*8+8] AS DOUBLE[]),
                              c.sv) AS d
                     FROM q, cb c),
             cand0 AS (SELECT p.query_id, a.neighbor_id
                       FROM probes p JOIN assigned a ON p.probe_cell = a.cell
                       WHERE a.neighbor_id <> p.query_id),
             adc AS (SELECT c0.query_id, c0.neighbor_id, sum(l.d) AS adot
                     FROM cand0 c0
                     JOIN codes cd ON cd.neighbor_id = c0.neighbor_id
                     JOIN lut l ON l.query_id = c0.query_id
                               AND l.j = cd.j AND l.i = cd.code
                     GROUP BY 1, 2),
             cand AS (SELECT query_id, neighbor_id FROM (
                        SELECT a.query_id, a.neighbor_id,
                               row_number() OVER (PARTITION BY a.query_id
                                 ORDER BY a.adot / (q.qn * cn.cn) DESC,
                                          a.neighbor_id) AS arank
                        FROM adc a
                        JOIN q ON q.query_id = a.query_id
                        JOIN cn ON cn.neighbor_id = a.neighbor_id)
                      WHERE arank <= 100),
             sc AS (SELECT c.query_id, c.neighbor_id,
                           list_cosine_similarity(q.qv, e.embedding) AS cos
                    FROM cand c
                    JOIN q ON q.query_id = c.query_id
                    JOIN embeddings e ON e.vec_id = c.neighbor_id),
             r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY cos DESC, neighbor_id) AS rank FROM sc)
             SELECT query_id, neighbor_id,
                    round(CAST(cos AS DOUBLE), 4) AS cos, rank
             FROM r WHERE rank <= 10 ORDER BY query_id, rank"""))

  /** FILTERED ANN through the driver gate — `ivfPqTopKFiltered` at the
    * composed-index parameter point with the predicate `label % 2 = 0`
    * (filters out roughly half the corpus): the encoded index rows carry
    * the label, the ADC scan sees only post-filter rows, and the probe
    * ring WIDENS deterministically until the exclusive prefix of
    * post-filter yield reaches rerank + 1 — at this corpus that takes
    * ~7–8 of 16 cells, so the gate exercises genuine partial expansion,
    * not the fixed-nProbe fast path and not the all-cells wall. The
    * oracle re-derives the whole cascade INCLUDING the adaptive probe
    * plan (per-cell yield counts + the same prefix-window rule), so a
    * post-filter implementation (k shrinks), a blind fixed-nProbe probe
    * (candidates missing), an off-by-one in the prefix rule, or an
    * unfiltered candidate leaking into the scan all break the hash.
    */
  private val simIvfPqFiltered = NamedQuery(
    "sim_ann_ivfpq_filtered",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      materializeForOracle(Similarity.ivfSeeds(emb, nCells = 16),
        d, "ivfpqf_seeds")
      materializeForOracle(
        Similarity.pqCodebook(emb, dims = 64, m = 8, ksub = 32),
        d, "ivfpqf_codebook")
      Similarity.ivfPqTopKFiltered(
          emb, emb.filter(col("vec_id").isin(0L, 1L, 2L)), k = 10,
          metaFilter = col("label") % 2 === 0, metaCols = Seq("label"),
          nCells = 16, nProbe = 4, dims = 64, m = 8, ksub = 32, rerank = 100)
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""WITH sd AS (SELECT cell_id, cv, cn2
                         FROM read_parquet('${oraclePath("ivfpqf_seeds")}')),
             cb AS (SELECT j, i, CAST(sv AS DOUBLE[]) AS sv, n2
                    FROM read_parquet('${oraclePath("ivfpqf_codebook")}')),
             assigned AS (
               SELECT neighbor_id, cell_id AS cell FROM (
                 SELECT e.vec_id AS neighbor_id, s.cell_id,
                        row_number() OVER (PARTITION BY e.vec_id
                          ORDER BY s.cn2 - 2 * list_inner_product(
                            CAST(e.embedding AS DOUBLE[]),
                            CAST(s.cv AS DOUBLE[])), s.cell_id) AS rn
                 FROM embeddings e, sd s
                 WHERE e.label % 2 = 0) WHERE rn = 1),
             cellcnt AS (SELECT cell, count(*) AS cnt
                         FROM assigned GROUP BY 1),
             probes AS (
               SELECT query_id, probe_cell FROM (
                 SELECT p0.query_id, p0.probe_cell, p0.rn,
                        coalesce(sum(c.cnt) OVER (PARTITION BY p0.query_id
                          ORDER BY p0.rn ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) AS prefix
                 FROM (SELECT query_id, cell_id AS probe_cell, rn FROM (
                         SELECT e.vec_id AS query_id, s.cell_id,
                                row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY s.cn2 - 2 * list_inner_product(
                                    CAST(e.embedding AS DOUBLE[]),
                                    CAST(s.cv AS DOUBLE[])), s.cell_id) AS rn
                         FROM embeddings e, sd s
                         WHERE e.vec_id IN (0, 1, 2)) WHERE rn <= 16) p0
                 LEFT JOIN cellcnt c ON c.cell = p0.probe_cell)
               WHERE rn <= 4 OR prefix < 101),
             codes AS (
               SELECT neighbor_id, j, i AS code FROM (
                 SELECT e.vec_id AS neighbor_id, c.j, c.i,
                        row_number() OVER (PARTITION BY e.vec_id, c.j
                          ORDER BY c.n2 - 2 * list_inner_product(
                            CAST(e.embedding[c.j*8+1 : c.j*8+8] AS DOUBLE[]),
                            c.sv), c.i) AS rn
                 FROM embeddings e, cb c) WHERE rn = 1),
             cn AS (SELECT vec_id AS neighbor_id,
                           sqrt(list_inner_product(
                             CAST(embedding AS DOUBLE[]),
                             CAST(embedding AS DOUBLE[]))) AS cn
                    FROM embeddings),
             q AS (SELECT vec_id AS query_id, embedding AS qv,
                          sqrt(list_inner_product(
                            CAST(embedding AS DOUBLE[]),
                            CAST(embedding AS DOUBLE[]))) AS qn
                   FROM embeddings WHERE vec_id IN (0, 1, 2)),
             lut AS (SELECT q.query_id, c.j, c.i,
                            list_inner_product(
                              CAST(q.qv[c.j*8+1 : c.j*8+8] AS DOUBLE[]),
                              c.sv) AS d
                     FROM q, cb c),
             cand0 AS (SELECT p.query_id, a.neighbor_id
                       FROM probes p JOIN assigned a ON p.probe_cell = a.cell
                       WHERE a.neighbor_id <> p.query_id),
             adc AS (SELECT c0.query_id, c0.neighbor_id, sum(l.d) AS adot
                     FROM cand0 c0
                     JOIN codes cd ON cd.neighbor_id = c0.neighbor_id
                     JOIN lut l ON l.query_id = c0.query_id
                               AND l.j = cd.j AND l.i = cd.code
                     GROUP BY 1, 2),
             cand AS (SELECT query_id, neighbor_id FROM (
                        SELECT a.query_id, a.neighbor_id,
                               row_number() OVER (PARTITION BY a.query_id
                                 ORDER BY a.adot / (q.qn * cn.cn) DESC,
                                          a.neighbor_id) AS arank
                        FROM adc a
                        JOIN q ON q.query_id = a.query_id
                        JOIN cn ON cn.neighbor_id = a.neighbor_id)
                      WHERE arank <= 100),
             sc AS (SELECT c.query_id, c.neighbor_id,
                           list_cosine_similarity(q.qv, e.embedding) AS cos
                    FROM cand c
                    JOIN q ON q.query_id = c.query_id
                    JOIN embeddings e ON e.vec_id = c.neighbor_id),
             r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY cos DESC, neighbor_id) AS rank FROM sc)
             SELECT query_id, neighbor_id,
                    round(CAST(cos AS DOUBLE), 4) AS cos, rank
             FROM r WHERE rank <= 10 ORDER BY query_id, rank"""))

  /** INCREMENTALLY-MAINTAINED IVF-PQ index — the serving-side lifecycle of
    * the composed index: artifacts (seeds + codebook) are FROZEN from a
    * training snapshot, then new vectors arrive as a STREAM and a
    * checkpointed foreachBatch sink encodes each micro-batch against the
    * frozen artifacts and APPENDS the (id, cell, codes, norm) rows to a
    * catalog table — the raw vectors are never re-read. The replay feeds
    * the corpus in two batches through TWO RUNS over one checkpoint (the
    * restart-recovery shape, like catalog_merge_stream), then probes the
    * catalog-built index — and the result must hash-match the SAME
    * DuckDB cascade as the one-shot `sim_ann_ivfpq` (identical params;
    * `ivfPqTopK` IS artifacts + encode + probe of the same expressions),
    * because the encode is a pure per-row function of (vector,
    * artifacts): batching cannot change a byte. A dropped or replayed
    * micro-batch (wrong candidate multiplicity), a batch encoded against
    * re-derived-from-partial-corpus artifacts (wrong cells/codes), or an
    * index row lost in the append all break the hash.
    */
  private val simIndexIncremental = NamedQuery(
    "sim_index_incremental_stream",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val (seedArr, cbArr) = Similarity.ivfPqArtifacts(
        emb, nCells = 16, dims = 64, m = 8, ksub = 32)
      materializeForOracle(Similarity.ivfSeeds(emb, nCells = 16),
        d, "ivfpqi_seeds")
      materializeForOracle(
        Similarity.pqCodebook(emb, dims = 64, m = 8, ksub = 32),
        d, "ivfpqi_codebook")
      val corpus = emb.select(col("vec_id"), col("embedding"))
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_annidx_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val cat = new graft.catalog.TableCatalog(s, root)
      val feed = graft.streaming.FileReplay(s, corpus.schema)
      def run(): Unit = {
        val q = feed.stream.writeStream
          .option("checkpointLocation", s"$root/_checkpoint")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            cat.append(Similarity.ivfPqEncode(batch, seedArr, cbArr,
              dims = 64, m = 8), "silver", "ann_index")
          }.start()
        q.awaitTermination()
      }
      val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
      // corpus-scaled replay partitions (StreamScale): cap 8 is the prior
      // fixed basis; the embeddings corpus is tiny below sf10
      s.conf.set("spark.sql.shuffle.partitions",
        graft.streaming.StreamScale.parts(
          Tables.rowCount(s, d, "embeddings"), 250000L, cap = 8).toString)
      try {
        // vec_id parity split — a deterministic executor-side predicate;
        // encode is a pure per-row function, so ANY split is byte-identical
        feed.stageCached(corpus.filter(col("vec_id") % 2 === 0),
          s"$d#embeddings#even"); run()
        feed.stageCached(corpus.filter(col("vec_id") % 2 =!= 0),
          s"$d#embeddings#odd"); run()
      } finally {
        feed.close()
        s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      }
      Similarity.ivfPqProbeIndex(
          cat.read("silver", "ann_index"), emb,
          emb.filter(col("vec_id").isin(0L, 1L, 2L)), seedArr, cbArr,
          k = 10, nProbe = 4, dims = 64, m = 8, rerank = 100)
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""WITH sd AS (SELECT cell_id, cv, cn2
                         FROM read_parquet('${oraclePath("ivfpqi_seeds")}')),
             cb AS (SELECT j, i, CAST(sv AS DOUBLE[]) AS sv, n2
                    FROM read_parquet('${oraclePath("ivfpqi_codebook")}')),
             assigned AS (
               SELECT neighbor_id, cell_id AS cell FROM (
                 SELECT e.vec_id AS neighbor_id, s.cell_id,
                        row_number() OVER (PARTITION BY e.vec_id
                          ORDER BY s.cn2 - 2 * list_inner_product(
                            CAST(e.embedding AS DOUBLE[]),
                            CAST(s.cv AS DOUBLE[])), s.cell_id) AS rn
                 FROM embeddings e, sd s) WHERE rn = 1),
             probes AS (
               SELECT query_id, cell_id AS probe_cell FROM (
                 SELECT e.vec_id AS query_id, s.cell_id,
                        row_number() OVER (PARTITION BY e.vec_id
                          ORDER BY s.cn2 - 2 * list_inner_product(
                            CAST(e.embedding AS DOUBLE[]),
                            CAST(s.cv AS DOUBLE[])), s.cell_id) AS rn
                 FROM embeddings e, sd s
                 WHERE e.vec_id IN (0, 1, 2)) WHERE rn <= 4),
             codes AS (
               SELECT neighbor_id, j, i AS code FROM (
                 SELECT e.vec_id AS neighbor_id, c.j, c.i,
                        row_number() OVER (PARTITION BY e.vec_id, c.j
                          ORDER BY c.n2 - 2 * list_inner_product(
                            CAST(e.embedding[c.j*8+1 : c.j*8+8] AS DOUBLE[]),
                            c.sv), c.i) AS rn
                 FROM embeddings e, cb c) WHERE rn = 1),
             cn AS (SELECT vec_id AS neighbor_id,
                           sqrt(list_inner_product(
                             CAST(embedding AS DOUBLE[]),
                             CAST(embedding AS DOUBLE[]))) AS cn
                    FROM embeddings),
             q AS (SELECT vec_id AS query_id, embedding AS qv,
                          sqrt(list_inner_product(
                            CAST(embedding AS DOUBLE[]),
                            CAST(embedding AS DOUBLE[]))) AS qn
                   FROM embeddings WHERE vec_id IN (0, 1, 2)),
             lut AS (SELECT q.query_id, c.j, c.i,
                            list_inner_product(
                              CAST(q.qv[c.j*8+1 : c.j*8+8] AS DOUBLE[]),
                              c.sv) AS d
                     FROM q, cb c),
             cand0 AS (SELECT p.query_id, a.neighbor_id
                       FROM probes p JOIN assigned a ON p.probe_cell = a.cell
                       WHERE a.neighbor_id <> p.query_id),
             adc AS (SELECT c0.query_id, c0.neighbor_id, sum(l.d) AS adot
                     FROM cand0 c0
                     JOIN codes cd ON cd.neighbor_id = c0.neighbor_id
                     JOIN lut l ON l.query_id = c0.query_id
                               AND l.j = cd.j AND l.i = cd.code
                     GROUP BY 1, 2),
             cand AS (SELECT query_id, neighbor_id FROM (
                        SELECT a.query_id, a.neighbor_id,
                               row_number() OVER (PARTITION BY a.query_id
                                 ORDER BY a.adot / (q.qn * cn.cn) DESC,
                                          a.neighbor_id) AS arank
                        FROM adc a
                        JOIN q ON q.query_id = a.query_id
                        JOIN cn ON cn.neighbor_id = a.neighbor_id)
                      WHERE arank <= 100),
             sc AS (SELECT c.query_id, c.neighbor_id,
                           list_cosine_similarity(q.qv, e.embedding) AS cos
                    FROM cand c
                    JOIN q ON q.query_id = c.query_id
                    JOIN embeddings e ON e.vec_id = c.neighbor_id),
             r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY cos DESC, neighbor_id) AS rank FROM sc)
             SELECT query_id, neighbor_id,
                    round(CAST(cos AS DOUBLE), 4) AS cos, rank
             FROM r WHERE rank <= 10 ORDER BY query_id, rank"""))

  /** RESIDUAL-encoded IVF-PQ production point — the FAISS-default
    * composition (codes over x − centroid, codebook trained on residuals)
    * at the same parameter point as `sim_ann_ivfpq`, hash-gated end to
    * end. Two materialized artifacts (seed table; residual codebook —
    * whose rows are already the seeded sample's residuals, so codebook
    * "training" itself rides the materialization like every seeded-hash
    * step) and the oracle re-derives the rest in DuckDB: cell argmin,
    * per-row DOUBLE residuals via a 64-term list comprehension, residual
    * encode argmin, the DECOMPOSED ADC score q·c + Σ lut[code] (one
    * centroid dot per query×probed-cell joined back per candidate), the
    * rerank cut, and the exact re-score. A sign slip in the residual, a
    * raw-vector LUT where a residual LUT belongs, or a dropped q·c term
    * all break the hash. The structure-resolving recall claim (residual
    * codes order within-cluster modes that raw codes collapse) is
    * SimilaritySpec-pinned.
    */
  private val simIvfPqResidual = NamedQuery(
    "sim_ann_ivfpq_residual",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      materializeForOracle(Similarity.ivfSeeds(emb, nCells = 16),
        d, "ivfpqr_seeds")
      materializeForOracle(
        Similarity.ivfPqResidualCodebook(emb, nCells = 16, dims = 64,
          m = 8, ksub = 32),
        d, "ivfpqr_codebook")
      Similarity.ivfPqTopKResidual(
          emb, emb.filter(col("vec_id").isin(0L, 1L, 2L)), k = 10,
          nCells = 16, nProbe = 4, dims = 64, m = 8, ksub = 32, rerank = 100)
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""WITH sd AS (SELECT cell_id, cv, cn2
                         FROM read_parquet('${oraclePath("ivfpqr_seeds")}')),
             cb AS (SELECT j, i, sv, n2
                    FROM read_parquet('${oraclePath("ivfpqr_codebook")}')),
             assigned AS (
               SELECT neighbor_id, cell_id AS cell FROM (
                 SELECT e.vec_id AS neighbor_id, s.cell_id,
                        row_number() OVER (PARTITION BY e.vec_id
                          ORDER BY s.cn2 - 2 * list_inner_product(
                            CAST(e.embedding AS DOUBLE[]),
                            CAST(s.cv AS DOUBLE[])), s.cell_id) AS rn
                 FROM embeddings e, sd s) WHERE rn = 1),
             res AS (SELECT a.neighbor_id, a.cell,
                            [CAST(e.embedding[kk] AS DOUBLE)
                               - CAST(s.cv[kk] AS DOUBLE)
                             FOR kk IN range(1, 65)] AS r
                     FROM assigned a
                     JOIN embeddings e ON e.vec_id = a.neighbor_id
                     JOIN sd s ON s.cell_id = a.cell),
             codes AS (
               SELECT neighbor_id, j, i AS code FROM (
                 SELECT r.neighbor_id, c.j, c.i,
                        row_number() OVER (PARTITION BY r.neighbor_id, c.j
                          ORDER BY c.n2 - 2 * list_inner_product(
                            r.r[c.j*8+1 : c.j*8+8], c.sv), c.i) AS rn
                 FROM res r, cb c) WHERE rn = 1),
             cn AS (SELECT vec_id AS neighbor_id,
                           sqrt(list_inner_product(
                             CAST(embedding AS DOUBLE[]),
                             CAST(embedding AS DOUBLE[]))) AS cn
                    FROM embeddings),
             q AS (SELECT vec_id AS query_id, embedding AS qv,
                          sqrt(list_inner_product(
                            CAST(embedding AS DOUBLE[]),
                            CAST(embedding AS DOUBLE[]))) AS qn
                   FROM embeddings WHERE vec_id IN (0, 1, 2)),
             probes AS (
               SELECT query_id, cell_id AS probe_cell FROM (
                 SELECT e.vec_id AS query_id, s.cell_id,
                        row_number() OVER (PARTITION BY e.vec_id
                          ORDER BY s.cn2 - 2 * list_inner_product(
                            CAST(e.embedding AS DOUBLE[]),
                            CAST(s.cv AS DOUBLE[])), s.cell_id) AS rn
                 FROM embeddings e, sd s
                 WHERE e.vec_id IN (0, 1, 2)) WHERE rn <= 4),
             qdc AS (SELECT p.query_id, p.probe_cell,
                            list_inner_product(CAST(q.qv AS DOUBLE[]),
                              CAST(s.cv AS DOUBLE[])) AS qdotc
                     FROM probes p
                     JOIN q ON q.query_id = p.query_id
                     JOIN sd s ON s.cell_id = p.probe_cell),
             lut AS (SELECT q.query_id, c.j, c.i,
                            list_inner_product(
                              CAST(q.qv[c.j*8+1 : c.j*8+8] AS DOUBLE[]),
                              c.sv) AS d
                     FROM q, cb c),
             cand0 AS (SELECT p.query_id, a.neighbor_id, p.probe_cell
                       FROM probes p JOIN assigned a ON p.probe_cell = a.cell
                       WHERE a.neighbor_id <> p.query_id),
             adc AS (SELECT c0.query_id, c0.neighbor_id,
                            qd.qdotc + sum(l.d) AS adot
                     FROM cand0 c0
                     JOIN qdc qd ON qd.query_id = c0.query_id
                               AND qd.probe_cell = c0.probe_cell
                     JOIN codes cd ON cd.neighbor_id = c0.neighbor_id
                     JOIN lut l ON l.query_id = c0.query_id
                               AND l.j = cd.j AND l.i = cd.code
                     GROUP BY 1, 2, qd.qdotc),
             cand AS (SELECT query_id, neighbor_id FROM (
                        SELECT a.query_id, a.neighbor_id,
                               row_number() OVER (PARTITION BY a.query_id
                                 ORDER BY a.adot / (q.qn * cn.cn) DESC,
                                          a.neighbor_id) AS arank
                        FROM adc a
                        JOIN q ON q.query_id = a.query_id
                        JOIN cn ON cn.neighbor_id = a.neighbor_id)
                      WHERE arank <= 100),
             sc AS (SELECT c.query_id, c.neighbor_id,
                           list_cosine_similarity(q.qv, e.embedding) AS cos
                    FROM cand c
                    JOIN q ON q.query_id = c.query_id
                    JOIN embeddings e ON e.vec_id = c.neighbor_id),
             r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY cos DESC, neighbor_id) AS rank FROM sc)
             SELECT query_id, neighbor_id,
                    round(CAST(cos AS DOUBLE), 4) AS cos, rank
             FROM r WHERE rank <= 10 ORDER BY query_id, rank"""))

  /** Lossless PQ parameter point: `rerank` ≥ any corpus size means the
    * approximate (ADC) stage can only ORDER candidates, never drop one, so
    * the exact re-rank must reproduce brute force top-k bit-for-bit no
    * matter how lossy the 8-byte codes are. Hash-gates the whole PQ
    * machinery (codebook determinism, encode argmin, LUT scoring, re-rank
    * fetch) against DuckDB's independently-computed top-k.
    */
  private val simPqExhaustive = NamedQuery(
    "sim_ann_pq_exhaustive",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.pqTopK(
          emb, emb.filter(col("vec_id").isin(0L, 1L, 2L)), k = 10,
          dims = 64, m = 8, ksub = 16, rerank = 1000000)
        .orderBy(col("query_id"), col("rank"))
    },
    Some(topkOracle))

  private val centroid = NamedQuery(
    "vector_centroid",
    (s, d) =>
      Similarity.centroidByGroup(Tables.embeddings(s, d), "label")
        .orderBy(col("label"), col("dim")),
    Some("""SELECT label, CAST(i - 1 AS INT) AS dim,
                   round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS centroid
            FROM embeddings, range(1, 65) t(i)
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  // ------------------------------------------------------------- text
  private val textStats = NamedQuery(
    "text_stats",
    (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        distinctTokenCount(col("text")).as("n_distinct_tokens"),
        charCount(col("text")).as("n_chars_norm"),
        md5Fingerprint(col("text")).as("fingerprint"),
        rollingHash(col("text")).as("rolling_hash"))
        .orderBy(col("doc_id")),
    Some(s"""SELECT doc_id,
                    len(string_split($normSql, ' ')) AS n_tokens,
                    len(list_distinct(string_split($normSql, ' '))) AS n_distinct_tokens,
                    strlen($normSql) AS n_chars_norm,
                    md5($normSql) AS fingerprint,
                    list_reduce(
                      list_transform(string_split($normSql, ''),
                                     c -> CAST(ord(c) AS BIGINT)),
                      (a, b) -> (a * 31 + b) % 1000000007) AS rolling_hash
             FROM documents ORDER BY doc_id"""))

  private val textQuality = NamedQuery(
    "text_quality",
    (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        round(avgTokenLen(col("text")), 4).as("avg_token_len"),
        round(stopwordRatio(col("text")), 4).as("stopword_ratio"),
        qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id")),
    Some(s"""WITH t AS (SELECT doc_id, string_split($normSql, ' ') AS toks,
                               strlen($normSql) AS nc
                        FROM documents),
             m AS (SELECT doc_id, len(toks) AS n_tokens,
                          (nc - (len(toks) - 1)) / len(toks) AS atl,
                          len(list_filter(toks, x -> list_contains(
                            ['the','a','of','and','to','in','is','it'], x)))
                            / len(toks) AS sr
                   FROM t)
             SELECT doc_id, n_tokens, round(atl, 4) AS avg_token_len,
                    round(sr, 4) AS stopword_ratio,
                    CAST(round(CAST(least(1.0, n_tokens / 100.0) * 0.4
                          + least(1.0, sr * 5.0) * 0.3
                          + CASE WHEN atl BETWEEN 3.0 AND 10.0
                                 THEN 0.3 ELSE 0.0 END AS DECIMAL(20,10)),
                        4) AS DOUBLE) AS quality
             FROM m ORDER BY doc_id"""))

  private val textLang = NamedQuery(
    "text_langid",
    (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"), col("lang"),
        langGuess(col("text")).as("lang_guess"))
        .withColumn("agree", (col("lang") === col("lang_guess")).cast("int"))
        .orderBy(col("doc_id")),
    Some(s"""WITH t AS (SELECT doc_id, lang,
                               list_distinct(string_split($normSql, ' ')) AS ts
                        FROM documents),
             sc AS (SELECT doc_id, lang,
               len(list_intersect(ts, ['der','die','das','und','ist','nicht','ein','zu'])) AS s_de,
               len(list_intersect(ts, ['the','a','of','and','to','in','is','it'])) AS s_en,
               len(list_intersect(ts, ['el','la','de','y','que','no','un','en'])) AS s_es,
               len(list_intersect(ts, ['le','la','les','et','des','un','une','est'])) AS s_fr,
               len(list_intersect(ts, ['de','shi','bu','le','zai','you','wo','ta'])) AS s_zh
               FROM t)
             SELECT doc_id, lang,
                    CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
                         WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
                         WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
                         WHEN s_fr >= s_zh THEN 'fr'
                         ELSE 'zh' END AS lang_guess,
                    CASE WHEN lang = (CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
                         WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
                         WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
                         WHEN s_fr >= s_zh THEN 'fr'
                         ELSE 'zh' END) THEN 1 ELSE 0 END AS agree
             FROM sc ORDER BY doc_id"""))

  // ------------------------------------------------------- multimodal
  private val mmMeta = NamedQuery(
    "multimodal_meta",
    (s, d) => {
      val media = Multimodal.fromBinaryColumn(
        Tables.documents(s, d), "doc_id", "text", "image")
      Multimodal.extractFeatures(media)
        .select(col("media_id"), col("modality"), col("byte_len"),
                round(col("mean_byte"), 4).as("mean_byte"), col("frame_count"))
        .orderBy(col("media_id"))
    },
    Some("""SELECT doc_id AS media_id, 'image' AS modality,
                   strlen(text) AS byte_len,
                   round(list_reduce(list_transform(string_split(text, ''),
                           c -> CAST(ord(c) AS BIGINT)), (a, b) -> a + b)
                         * 1.0 / strlen(text), 4) AS mean_byte,
                   CASE WHEN strlen(text) = 0 THEN 0
                        ELSE (strlen(text) - 1) // 64 + 1 END AS frame_count
            FROM documents ORDER BY media_id"""))

  private val mmFrames = NamedQuery(
    "multimodal_framesample",
    (s, d) => {
      val media = Multimodal.fromBinaryColumn(
        Tables.documents(s, d), "doc_id", "text", "video")
      Multimodal.sampleFrames(media, stride = 4)
        .select(col("media_id"), col("n_sampled_frames"))
        .orderBy(col("media_id"))
    },
    // stride arithmetic on the frame index sequence: NON-EMPTY frames are
    // indices 0..(len-1)/64 with i % 4 = 0, so the count is
    // ((len-1)//64)//4 + 1 for len > 0 and 0 for an empty payload
    // (same strlen-as-bytes trick as multimodal_meta's oracle).
    Some("""SELECT doc_id AS media_id,
                   CAST(CASE WHEN strlen(text) = 0 THEN 0
                             ELSE ((strlen(text) - 1) // 64) // 4 + 1
                        END AS INT) AS n_sampled_frames
            FROM documents ORDER BY media_id"""))

  /** Per-frame features of the sampled frames — frame index, length, mean
    * byte (the ord-arithmetic trick of multimodal_meta, per frame).
    */
  private val mmFrameStats = NamedQuery(
    "multimodal_frame_stats",
    (s, d) => {
      val media = Multimodal.fromBinaryColumn(
        Tables.documents(s, d), "doc_id", "text", "video")
      Multimodal.frameStats(media, stride = 4)
        .orderBy(col("media_id"), col("frame_idx"))
    },
    Some("""WITH idx AS (SELECT doc_id AS media_id, text,
                   unnest([i FOR i IN range(0, strlen(text) // 64 + 1) IF i % 4 = 0]) AS frame_idx
                 FROM documents),
            fr AS (SELECT media_id, frame_idx,
                          substring(text, frame_idx * 64 + 1, 64) AS f
                   FROM idx),
            nz AS (SELECT * FROM fr WHERE strlen(f) > 0)
            SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
                   CAST(strlen(f) AS INT) AS frame_len,
                   round(list_reduce(list_transform(string_split(f, ''),
                           c -> CAST(ord(c) AS BIGINT)), (a, b) -> a + b)
                         * 1.0 / strlen(f), 4) AS mean_byte
            FROM nz ORDER BY media_id, frame_idx"""))

  /** REAL WAV decode through the driver gate (r10 VERDICT task 7): one
    * genuine RIFF/WAVE PCM16 file is synthesized per document id,
    * chunk-walk DECODED (magic, fmt, data, alignment — `decodeWav`), and
    * every output column comes from the decoded container/samples. The
    * synthesis closed form (s_k = (id·7919 + k·104729) mod 2¹⁶ − 2¹⁵,
    * n = 1000 + id mod 500) is what lets DuckDB re-derive the features
    * WITHOUT parsing bytes: if the decoder misreads the header, drops a
    * chunk, or mis-signs a sample, the hash breaks. Σs² is exact in
    * BIGINT on both sides, so rms survives the double round-trip
    * bit-for-bit.
    */
  private val mmWavDecode = NamedQuery(
    "multimodal_wav_decode",
    (s, d) =>
      Multimodal.wavFeatures(Tables.documents(s, d), "doc_id")
        .select(col("media_id"), col("sample_rate"), col("channels"),
          col("n_samples"), col("duration_ms"), col("peak"),
          round(col("rms"), 4).as("rms"))
        .orderBy(col("media_id")),
    Some("""WITH par AS (SELECT doc_id AS media_id,
                                CAST(1000 + doc_id % 500 AS INT) AS n
                         FROM documents),
            sm AS (SELECT media_id, n,
                          [CAST((media_id * 7919 + k * 104729) % 65536
                                - 32768 AS BIGINT)
                           FOR k IN range(0, n)] AS samples
                   FROM par)
            SELECT media_id,
                   44100 AS sample_rate, 1 AS channels,
                   n AS n_samples,
                   CAST(n * 1000 // 44100 AS BIGINT) AS duration_ms,
                   CAST(list_max(list_transform(samples, x -> abs(x)))
                        AS INT) AS peak,
                   round(sqrt(list_sum(list_transform(samples, x -> x * x))
                              * 1.0 / n), 4) AS rms
            FROM sm ORDER BY media_id"""))

  /** REAL BMP decode through the driver gate (r11 VERDICT task 9 — the
    * image-modality twin of `multimodal_wav_decode`): one genuine 24bpp
    * bottom-up BMP is synthesized per document id and decoded through
    * the JDK's own ImageIO BMP reader; every output column comes from
    * the decoded raster. The stored-byte closed form
    * f(k, c) = (id·7919 + k·104729 + c·131) mod 256 (k = storedRow·w + x,
    * c = B/G/R on disk, w = 8 + id mod 9, h = 6 + id mod 7) lets DuckDB
    * re-derive everything WITHOUT touching bytes: plain channel sums are
    * row-order-invariant, so the gate also carries a position-weighted
    * red sum over DECODED coordinates — the oracle maps stored row r to
    * image row h−1−r (bottom-up), and a decoder that flipped, swapped
    * channels, or misread padding breaks the hash.
    */
  private val mmBmpDecode = NamedQuery(
    "multimodal_bmp_decode",
    (s, d) =>
      Multimodal.bmpFeatures(Tables.documents(s, d), "doc_id")
        .select(col("media_id"), col("width"), col("height"),
          col("n_pixels"), col("sum_r"), col("sum_g"), col("sum_b"),
          col("wsum_r"), round(col("mean_lum"), 4).as("mean_lum"))
        .orderBy(col("media_id")),
    Some("""WITH par AS (SELECT doc_id AS media_id,
                                CAST(8 + doc_id % 9 AS INT) AS w,
                                CAST(6 + doc_id % 7 AS INT) AS h
                         FROM documents),
            px AS (SELECT media_id, w, h,
                          [CAST((media_id * 7919 + k * 104729) % 256
                                AS BIGINT) FOR k IN range(0, w * h)] AS b,
                          [CAST((media_id * 7919 + k * 104729 + 131) % 256
                                AS BIGINT) FOR k IN range(0, w * h)] AS g,
                          [CAST((media_id * 7919 + k * 104729 + 262) % 256
                                AS BIGINT) FOR k IN range(0, w * h)] AS r,
                          [CAST(((media_id * 7919 + k * 104729 + 262) % 256)
                                * ((h - 1 - k // w) * w + k % w)
                                AS BIGINT) FOR k IN range(0, w * h)] AS wr
                   FROM par)
            SELECT media_id, w AS width, h AS height,
                   CAST(w * h AS BIGINT) AS n_pixels,
                   CAST(list_sum(r) AS BIGINT) AS sum_r,
                   CAST(list_sum(g) AS BIGINT) AS sum_g,
                   CAST(list_sum(b) AS BIGINT) AS sum_b,
                   CAST(list_sum(wr) AS BIGINT) AS wsum_r,
                   round((list_sum(r) + list_sum(g) + list_sum(b)) * 1.0
                         / (3.0 * w * h), 4) AS mean_lum
            FROM px ORDER BY media_id"""))

  /** REAL PNG decode through the driver gate (round 12 — the
    * compressed-image twin of `multimodal_bmp_decode`): one genuine
    * 8-bit RGB truecolor PNG is synthesized per document id — signature,
    * IHDR, a single zlib-DEFLATED IDAT, IEND, every chunk CRC-32-stamped,
    * scanline y stored under filter type y mod 5 so all five PNG
    * predictors (None/Sub/Up/Average/Paeth) are exercised in every
    * image — and decoded through the JDK's pure-JVM ImageIO PNG reader
    * (java.util.zip inflate + de-filtering). Every output column comes
    * from the decoded raster. The pixel closed form
    * f(k, c) = (id·7919 + k·104729 + c·131) mod 256 (k = y·w + x
    * top-down, c = R/G/B in-stream, w = 9 + id mod 8, h = 5 + id mod 6)
    * lets DuckDB re-derive everything WITHOUT touching bytes; the
    * position-weighted red sum's weight is k itself (PNG has no BMP
    * flip), so a filter-predictor bug anywhere in the inflate/de-filter
    * chain breaks the hash.
    */
  private val mmPngDecode = NamedQuery(
    "multimodal_png_decode",
    (s, d) =>
      Multimodal.pngFeatures(Tables.documents(s, d), "doc_id")
        .select(col("media_id"), col("width"), col("height"),
          col("n_pixels"), col("sum_r"), col("sum_g"), col("sum_b"),
          col("wsum_r"), round(col("mean_lum"), 4).as("mean_lum"))
        .orderBy(col("media_id")),
    Some("""WITH par AS (SELECT doc_id AS media_id,
                                CAST(9 + doc_id % 8 AS INT) AS w,
                                CAST(5 + doc_id % 6 AS INT) AS h
                         FROM documents),
            px AS (SELECT media_id, w, h,
                          [CAST((media_id * 7919 + k * 104729) % 256
                                AS BIGINT) FOR k IN range(0, w * h)] AS r,
                          [CAST((media_id * 7919 + k * 104729 + 131) % 256
                                AS BIGINT) FOR k IN range(0, w * h)] AS g,
                          [CAST((media_id * 7919 + k * 104729 + 262) % 256
                                AS BIGINT) FOR k IN range(0, w * h)] AS b,
                          [CAST(((media_id * 7919 + k * 104729) % 256) * k
                                AS BIGINT) FOR k IN range(0, w * h)] AS wr
                   FROM par)
            SELECT media_id, w AS width, h AS height,
                   CAST(w * h AS BIGINT) AS n_pixels,
                   CAST(list_sum(r) AS BIGINT) AS sum_r,
                   CAST(list_sum(g) AS BIGINT) AS sum_g,
                   CAST(list_sum(b) AS BIGINT) AS sum_b,
                   CAST(list_sum(wr) AS BIGINT) AS wsum_r,
                   round((list_sum(r) + list_sum(g) + list_sum(b)) * 1.0
                         / (3.0 * w * h), 4) AS mean_lum
            FROM px ORDER BY media_id"""))

  /** REAL Common-Crawl-shaped ingestion through the driver gate (round
    * 12): one genuine multi-member `.warc.gz` is synthesized per
    * document id — one gzip member per WARC record, rotated header
    * order, an unknown extension header in every block, and every third
    * body STARTING with a literal `WARC/1.0` record marker — then
    * inflated and Content-Length-frame-parsed for real
    * (`sources/Warc.scala`). Every output column comes from the parser.
    * The closed form (records n = 2 + id mod 4; body char
    * 'a' + (id + 3i) mod 26; filler length 10 + (3·id + 17·i) mod 91;
    * trap iff (id + i) mod 3 = 0, adding the 29-byte marker prefix)
    * lets DuckDB re-derive everything byte-free: a parser that scanned
    * for record magics instead of honoring Content-Length would split
    * the trap bodies and break the row count, lengths, and first_char
    * ('W' on trap records) all at once.
    */
  private val warcExtract = NamedQuery(
    "warc_extract",
    (s, d) =>
      Warc.warcRecords(Tables.documents(s, d), "doc_id")
        .select(col("media_id"), col("rec_idx"), col("warc_type"),
          col("target_uri"), col("content_length"), col("first_char"),
          col("last_char"))
        .orderBy(col("media_id"), col("rec_idx")),
    Some("""WITH par AS (SELECT doc_id AS media_id,
                                CAST(2 + doc_id % 4 AS INT) AS n
                         FROM documents),
            rec AS (SELECT media_id,
                           unnest([k FOR k IN range(0, n)]) AS i
                    FROM par)
            SELECT media_id,
                   CAST(i AS INT) AS rec_idx,
                   'response' AS warc_type,
                   'https://example.org/' || CAST(media_id AS VARCHAR)
                     || '/' || CAST(i AS VARCHAR) AS target_uri,
                   CAST(CASE WHEN (media_id + i) % 3 = 0 THEN 29 ELSE 0 END
                        + 10 + (media_id * 3 + i * 17) % 91
                        AS INT) AS content_length,
                   CASE WHEN (media_id + i) % 3 = 0 THEN 'W'
                        ELSE chr(97 + CAST((media_id + 3 * i) % 26 AS INT))
                   END AS first_char,
                   chr(97 + CAST((media_id + 3 * i) % 26 AS INT))
                     AS last_char
            FROM rec ORDER BY media_id, rec_idx"""))

  /** REAL GIF decode through the driver gate (round 12 — the third
    * compression family: LZW, beside PNG's deflate and BMP's raw
    * raster): one genuine GIF87a per document id, hand-built — 256-entry
    * closed-form global color table, literal-coded 9-bit LZW stream
    * with a CLEAR every 250 pixels (mid-image dictionary resets),
    * ≤255-byte sub-blocks — and decoded through the JDK's pure-JVM
    * ImageIO GIF reader. The pixel index stream idx(k) =
    * (id·7919 + k·104729) mod 256 and palette (j, (131j+7) mod 256,
    * (197j+11) mod 256) are both closed-form: decoded red IS the index
    * (pinning LZW code order across resets and sub-block boundaries via
    * the position-weighted sum), green/blue pin the palette lookup.
    */
  private val mmGifDecode = NamedQuery(
    "multimodal_gif_decode",
    (s, d) =>
      Multimodal.gifFeatures(Tables.documents(s, d), "doc_id")
        .select(col("media_id"), col("width"), col("height"),
          col("n_pixels"), col("sum_r"), col("sum_g"), col("sum_b"),
          col("wsum_r"), round(col("mean_lum"), 4).as("mean_lum"))
        .orderBy(col("media_id")),
    Some("""WITH par AS (SELECT doc_id AS media_id,
                                CAST(10 + doc_id % 7 AS INT) AS w,
                                CAST(16 + doc_id % 9 AS INT) AS h
                         FROM documents),
            px AS (SELECT media_id, w, h,
                          [CAST((media_id * 7919 + k * 104729) % 256
                                AS BIGINT) FOR k IN range(0, w * h)] AS r,
                          [CAST(((media_id * 7919 + k * 104729) % 256)
                                  * 131 % 256 + 7
                                AS BIGINT) FOR k IN range(0, w * h)] AS g0,
                          [CAST(((media_id * 7919 + k * 104729) % 256)
                                  * 197 % 256 + 11
                                AS BIGINT) FOR k IN range(0, w * h)] AS b0,
                          [CAST(((media_id * 7919 + k * 104729) % 256) * k
                                AS BIGINT) FOR k IN range(0, w * h)] AS wr
                   FROM par),
            nx AS (SELECT media_id, w, h, r, wr,
                          list_transform(g0, x -> x % 256) AS g,
                          list_transform(b0, x -> x % 256) AS b
                   FROM px)
            SELECT media_id, w AS width, h AS height,
                   CAST(w * h AS BIGINT) AS n_pixels,
                   CAST(list_sum(r) AS BIGINT) AS sum_r,
                   CAST(list_sum(g) AS BIGINT) AS sum_g,
                   CAST(list_sum(b) AS BIGINT) AS sum_b,
                   CAST(list_sum(wr) AS BIGINT) AS wsum_r,
                   round((list_sum(r) + list_sum(g) + list_sum(b)) * 1.0
                         / (3.0 * w * h), 4) AS mean_lum
            FROM nx ORDER BY media_id"""))

  /** REAL JPEG decode through the driver gate (round 12, closing the
    * last "environment-blocked" image residual — the JDK bundles its
    * own JPEG codec): one genuine JPEG per document id, encoded by the
    * JDK writer from closed-form pixels and decoded through the full
    * entropy-decode + IDCT + chroma-upsampling path. JPEG is lossy, so
    * the gate splits the contract: width/height/n_pixels (the SOF
    * marker walk) are oracle-exact; content correctness is the REAL
    * decoded-vs-synthesis mean-luma proximity check `lum_close`
    * (|Δ| < 3.0; measured ~0.1), which the oracle pins TRUE — a broken
    * IDCT, component order, or upsampler flips it. Dims avoid 8/16
    * multiples so edge MCUs are exercised.
    *
    * ENVIRONMENT DEPENDENCY (r13 note): the oracle hard-pins
    * `lum_close = TRUE`, so gate greenness rides on the JDK's bundled
    * JPEG ENCODER defaults staying inside the |Δ mean luma| < 3.0 bound.
    * Measured margin is ~30× (Δ ≈ 0.1) on the pinned toolchain —
    * Debian OpenJDK 17.0.20 (+8-1-deb12u1), `com.sun.imageio` JPEG
    * plugin, default quality ≈ 0.75 quantization tables. If this gate ever goes
    * red with NO repo change, diagnose as environmental first: a JDK
    * upgrade that reworked default quantization/subsampling would shift
    * decoded luma uniformly; re-measure Δ (MultimodalSpec prints it) and
    * re-pin before suspecting the decoder.
    */
  private val mmJpegDecode = NamedQuery(
    "multimodal_jpeg_decode",
    (s, d) =>
      Multimodal.jpegFeatures(Tables.documents(s, d), "doc_id")
        .select(col("media_id"), col("width"), col("height"),
          col("n_pixels"), col("lum_close"))
        .orderBy(col("media_id")),
    Some("""SELECT doc_id AS media_id,
                   CAST(9 + doc_id % 8 AS INT) AS width,
                   CAST(7 + doc_id % 6 AS INT) AS height,
                   CAST((9 + doc_id % 8) * (7 + doc_id % 6) AS BIGINT)
                     AS n_pixels,
                   TRUE AS lum_close
            FROM documents ORDER BY media_id"""))

  /** REAL VIDEO decode through the driver gate (round 12 — the last
    * stubbed modality gets a genuinely decoded format): one genuine
    * uncompressed-DIB AVI per document id — full RIFF container with
    * avih/strh/strf headers, a movi LIST of '00db' raw bottom-up BGR
    * frames, and an idx1 index — demuxed and frame-decoded by a real
    * chunk walk (`Multimodal.decodeAvi`): header validation, 24bpp
    * BI_RGB check, per-frame declared-size check, DIB row flip and
    * 4-byte row padding. One output row per decoded FRAME; the stored
    * byte closed form f(k,c,frame) = (id·7919 + 31·frame + k·104729 +
    * c·131) mod 256 (c = B/G/R on disk) lets DuckDB re-derive every
    * channel sum byte-free, and the position-weighted red sum is over
    * DECODED top-down coordinates so a missed row flip breaks the hash.
    * H.264 entropy decode stays environment-blocked (stub retained).
    */
  private val mmAviDecode = NamedQuery(
    "multimodal_avi_decode",
    (s, d) =>
      Multimodal.aviFrameFeatures(Tables.documents(s, d), "doc_id")
        .select(col("media_id"), col("frame_idx"), col("width"),
          col("height"), col("sum_r"), col("sum_g"), col("sum_b"),
          col("wsum_r"))
        .orderBy(col("media_id"), col("frame_idx")),
    Some("""WITH par AS (SELECT doc_id AS media_id,
                                CAST(8 + doc_id % 5 AS INT) AS w,
                                CAST(6 + doc_id % 4 AS INT) AS h,
                                CAST(3 + doc_id % 4 AS INT) AS n
                         FROM documents),
            fr AS (SELECT media_id, w, h,
                          unnest([f FOR f IN range(0, n)]) AS fi
                   FROM par),
            px AS (SELECT media_id, CAST(fi AS INT) AS frame_idx, w, h,
                          [CAST((media_id * 7919 + 31 * fi
                                 + k * 104729 + 262) % 256
                                AS BIGINT) FOR k IN range(0, w * h)] AS r,
                          [CAST((media_id * 7919 + 31 * fi
                                 + k * 104729 + 131) % 256
                                AS BIGINT) FOR k IN range(0, w * h)] AS b2,
                          [CAST((media_id * 7919 + 31 * fi
                                 + k * 104729) % 256
                                AS BIGINT) FOR k IN range(0, w * h)] AS b0,
                          [CAST(((media_id * 7919 + 31 * fi
                                  + k * 104729 + 262) % 256)
                                * ((h - 1 - k // w) * w + k % w)
                                AS BIGINT) FOR k IN range(0, w * h)] AS wr
                   FROM fr)
            SELECT media_id, frame_idx, w AS width, h AS height,
                   CAST(list_sum(r) AS BIGINT) AS sum_r,
                   CAST(list_sum(b2) AS BIGINT) AS sum_g,
                   CAST(list_sum(b0) AS BIGINT) AS sum_b,
                   CAST(list_sum(wr) AS BIGINT) AS wsum_r
            FROM px ORDER BY media_id, frame_idx"""))

  /** REAL COMPRESSED VIDEO through the driver gate (r13, VERDICT r12
    * task 3): one genuine MJPEG AVI per document id — the same RIFF
    * container walk as multimodal_avi_decode but the stream declares
    * 'MJPG' and every movi frame is a complete baseline JPEG, demuxed
    * and run through the JDK's bundled JPEG codec (entropy decode +
    * IDCT + chroma upsampling) per frame. JPEG is lossy, so the gate
    * carries the split contract multimodal_jpeg_decode established:
    * container facts (dims, per-frame rows, pixel counts) are
    * oracle-exact, content correctness is the per-frame decoded-vs-
    * synthesis mean-luma proximity check (|Δ| < 3.0, measured ~0.1)
    * pinned TRUE — and inherits the same JDK-encoder-defaults
    * environment dependency recorded on the JPEG gate. Frame chunk
    * sizes VARY per frame (entropy-coded), exercising the demux case
    * the fixed-size DIB walk never hits. H.264/H.265 remains the only
    * stub, genuinely environment-blocked.
    */
  private val mmMjpegDecode = NamedQuery(
    "multimodal_mjpeg_decode",
    (s, d) =>
      Multimodal.mjpegFrameFeatures(Tables.documents(s, d), "doc_id")
        .select(col("media_id"), col("frame_idx"), col("width"),
          col("height"), col("n_pixels"), col("lum_close"))
        .orderBy(col("media_id"), col("frame_idx")),
    Some("""WITH par AS (SELECT doc_id AS media_id,
                                CAST(9 + doc_id % 8 AS INT) AS w,
                                CAST(7 + doc_id % 6 AS INT) AS h,
                                CAST(2 + doc_id % 3 AS INT) AS n
                         FROM documents)
            SELECT media_id, CAST(fi AS INT) AS frame_idx,
                   w AS width, h AS height,
                   CAST(w * h AS BIGINT) AS n_pixels,
                   TRUE AS lum_close
            FROM par, unnest([f FOR f IN range(0, n)]) t(fi)
            ORDER BY media_id, frame_idx"""))

  /** REAL COMPRESSED AUDIO through the driver gate (r14, VERDICT r13
    * task 3 — the audio twin of GIF's hand-built LZW): one genuine
    * RIFF/WAVE IMA-ADPCM file (fmt tag 0x11, extended header, fact
    * chunk, 2 + id mod 4 blocks of 36 bytes) is synthesized per document
    * id and decoded by the full IMA algorithm — 89-entry step table,
    * index walk with clamps, sign nibbles, predictor saturation, low
    * nibble first. The stream pins the step index at 0 by construction
    * (nibble pairs (m, m|8), m ∈ {1,2,3} — see `synthAdpcmWav`), so the
    * decoded samples are CLOSED-FORM and the oracle re-derives every
    * feature from the id alone: block b decodes to s₀ = P_b,
    * s_{1+2j} = P_b + d_j, s_{2+2j} = P_b with P_b = (id·7919 + b·257)
    * mod 1024 − 512 and d_j = [1,3,4][(id + b·131 + j·17) mod 3].
    * `wsum_samples` (Σ k·s_k) pins exact sample ORDER — nibble-half
    * swaps and dropped header samples break it where plain sums don't.
    * Σs² is exact BIGINT on both sides, so rms survives the double
    * round-trip bit-for-bit. The decoder's ADAPTATION paths (index walk,
    * saturation) are pinned by MultimodalSpec's in-test encoder duality
    * over white-noise content. With this gate all three modalities have
    * a real compressed codec: deflate/LZW/DCT (image), DCT (video),
    * ADPCM (audio).
    */
  private val mmAdpcmDecode = NamedQuery(
    "multimodal_adpcm_decode",
    (s, d) =>
      Multimodal.adpcmFeatures(Tables.documents(s, d), "doc_id")
        .select(col("media_id"), col("sample_rate"), col("block_align"),
          col("n_blocks"), col("n_samples"), col("peak"),
          col("sum_samples"), col("wsum_samples"),
          round(col("rms"), 4).as("rms"))
        .orderBy(col("media_id")),
    Some("""WITH par AS (SELECT doc_id AS media_id,
                                CAST(2 + doc_id % 4 AS INT) AS nb
                         FROM documents),
            blk AS (SELECT media_id, nb,
                           unnest([b FOR b IN range(0, nb)]) AS b
                    FROM par),
            bs AS (SELECT media_id, nb, b,
                          CAST((media_id * 7919 + b * 257) % 1024 - 512
                               AS BIGINT) AS p,
                          [CAST(CASE (media_id + b * 131 + j * 17) % 3
                                WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END
                                AS BIGINT) FOR j IN range(0, 32)] AS d,
                          [CAST((b * 65 + 1 + 2 * j) *
                                (CASE (media_id + b * 131 + j * 17) % 3
                                 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END)
                                AS BIGINT) FOR j IN range(0, 32)] AS wd
                   FROM blk),
            agg AS (SELECT media_id, nb,
                      CAST(sum(65 * p + list_sum(d)) AS BIGINT) AS ssum,
                      CAST(sum(p * (4225 * b + 2080) + list_sum(wd))
                           AS BIGINT) AS swsum,
                      CAST(sum(33 * p * p + list_sum(list_transform(d,
                             x -> (p + x) * (p + x)))) AS BIGINT) AS ssq,
                      CAST(max(greatest(abs(p), abs(p + list_max(d))))
                           AS INT) AS pk
                    FROM bs GROUP BY media_id, nb)
            SELECT media_id, 22050 AS sample_rate, 36 AS block_align,
                   nb AS n_blocks, CAST(nb * 65 AS INT) AS n_samples,
                   pk AS peak, ssum AS sum_samples, swsum AS wsum_samples,
                   round(sqrt(ssq * 1.0 / (nb * 65)), 4) AS rms
            FROM agg ORDER BY media_id"""))

  val all: Seq[NamedQuery] = Seq(
    warcExtract,
    dedupExact, dedupNgram, dedupNgramCapped, dedupContainment,
    dedupMinhash, dedupSimhash, dedupSimhashCapped,
    dedupSimhashContained, dedupIncrementalProbe, dedupEmbedding,
    dedupEmbeddingCapped,
    simTopK, simMmr, simMatryoshka, simAnn, simIvf, simPq, simIvfPq,
    simIvfPqFiltered,
    simIvfPqResidual,
    simIndexIncremental, simLshExhaustive, simIvfExhaustive,
    simPqExhaustive,
    centroid, textStats, textQuality, textLang,
    mmMeta, mmFrames, mmFrameStats, mmWavDecode, mmAdpcmDecode,
    mmBmpDecode,
    mmPngDecode, mmGifDecode, mmJpegDecode, mmAviDecode, mmMjpegDecode)
}
