package graft.queries

import graft.{NamedQuery, Tables}
import graft.operators.{Dedup, Export, KMeans, LmScore, TfIdf}
import org.apache.spark.sql.functions._

/** Round-4 curation additions: bigram-LM quality scoring (the CCNet-style
  * perplexity proxy), exact-substring duplicated-window stats (span-level
  * dedup signal), deterministic shard export manifests, and vocabulary
  * OOV-coverage ratios. All four carry full DuckDB oracles.
  */
object CurationQueries {

  private val normSql = raw"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"

  /** Mean bigram negative log-likelihood per document under the corpus's
    * own add-one-smoothed bigram model. The oracle rebuilds the identical
    * model in SQL (zipped unnest for the bigram stream), so a smoothing
    * constant, a miscounted context, or a wrong vocabulary size all break
    * the hash.
    */
  private val lmScore = NamedQuery(
    "text_lm_score",
    (s, d) =>
      LmScore.bigramLogLoss(Tables.documents(s, d))
        .orderBy(col("doc_id")),
    Some(s"""WITH tok AS (SELECT doc_id, string_split($normSql, ' ') AS l
                          FROM documents),
             e AS (SELECT doc_id,
                          unnest(l[1:len(l) - 1]) AS w1,
                          unnest(l[2:len(l)]) AS w2
                   FROM tok WHERE len(l) >= 2),
             cb AS (SELECT w1, w2, count(*) AS c_bg FROM e GROUP BY 1, 2),
             cc AS (SELECT w1, count(*) AS c_ctx FROM e GROUP BY 1),
             v AS (SELECT count(DISTINCT t) AS v_size
                   FROM (SELECT unnest(l) AS t FROM tok)),
             sc AS (SELECT e.doc_id,
                           -ln((cb.c_bg + 1.0) / (cc.c_ctx + v.v_size)) AS nll
                    FROM e JOIN cb USING (w1, w2)
                           JOIN cc USING (w1) CROSS JOIN v)
             SELECT doc_id, count(*) AS n_bigrams,
                    round(avg(nll), 4) AS lm_score
             FROM sc GROUP BY 1 ORDER BY 1"""))

  /** Exact-substring duplication: per document, the count and fraction of
    * its 8-token windows that also occur in at least one other document.
    * The oracle recomputes every window as a string (the engine side runs
    * on xxhash64 window hashes), so the window stride, the short-doc arm,
    * and the distinct-doc threshold are all hash-checked.
    */
  private val dupSpans = NamedQuery(
    "text_dup_spans",
    (s, d) =>
      Dedup.dupWindowStats(Tables.documents(s, d), n = 8)
        .orderBy(col("doc_id")),
    Some(s"""WITH tok AS (SELECT doc_id, string_split($normSql, ' ') AS l
                          FROM documents),
             w AS (SELECT doc_id,
                          CASE WHEN len(l) < 8 THEN [array_to_string(l, ' ')]
                               ELSE [array_to_string(l[i:i+7], ' ')
                                     FOR i IN range(1, len(l) - 6)]
                          END AS ws
                   FROM tok),
             occ AS (SELECT doc_id, unnest(ws) AS w FROM w),
             dw AS (SELECT w FROM (SELECT w, count(DISTINCT doc_id) AS nd
                                   FROM occ GROUP BY 1)
                    WHERE nd >= 2)
             SELECT o.doc_id, count(*) AS n_windows,
                    count(d.w) AS n_dup_windows,
                    round(count(d.w) * 1.0 / count(*), 4) AS dup_frac
             FROM occ o LEFT JOIN dw d USING (w)
             GROUP BY 1 ORDER BY 1"""))

  /** Variable-length exact-substring spans (the suffix-array-family signal
    * `text_dup_spans` only counts): overlapping/adjacent duplicated 8-token
    * windows chained into MAXIMAL per-doc spans, spans ≥ 12 tokens kept —
    * so every surviving row REQUIRED the merge (a lone window is only 8).
    * The oracle rebuilds windows as strings WITH positions, re-derives the
    * duplicated set, and replays the gaps-and-islands chain (lag ≤ n starts
    * no island, the sum-over-window island id, the doc-tail clamp) in plain
    * SQL: a stride slip, an off-by-one in the chain threshold (windows at
    * distance exactly n must merge — their token ranges touch), a wrong
    * span end, or a dropped short-doc arm all break the hash.
    */
  private val dupSpanMerge = NamedQuery(
    "text_dup_span_merge",
    (s, d) =>
      Dedup.dupSpanMerge(Tables.documents(s, d), n = 8, minSpan = 12)
        .orderBy(col("doc_id"), col("span_start")),
    Some(s"""WITH tok AS (SELECT doc_id, string_split($normSql, ' ') AS l
                          FROM documents),
             w AS (SELECT doc_id, len(l) AS nt,
                     CASE WHEN len(l) < 8
                          THEN [{'p': 0, 'w': array_to_string(l, ' ')}]
                          ELSE [{'p': i - 1,
                                 'w': array_to_string(l[i:i+7], ' ')}
                                FOR i IN range(1, len(l) - 6)]
                     END AS ws
                   FROM tok),
             occ AS (SELECT doc_id, nt, unnest(ws) AS u FROM w),
             dupw AS (SELECT w FROM (SELECT u.w AS w,
                                            count(DISTINCT doc_id) AS nd
                                     FROM occ GROUP BY 1) WHERE nd >= 2),
             dp AS (SELECT o.doc_id, o.nt, (o.u).p AS pos
                    FROM occ o JOIN dupw d ON (o.u).w = d.w),
             isl AS (SELECT doc_id, nt, pos,
                       CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
                              ORDER BY pos) <= 8 THEN 0 ELSE 1 END AS ns
                     FROM dp),
             sp AS (SELECT doc_id, nt, pos,
                      sum(ns) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS sid
                    FROM isl),
             agg AS (SELECT doc_id, sid, min(pos) AS span_start,
                            least(max(pos) + 7, min(nt) - 1) AS span_end
                     FROM sp GROUP BY 1, 2)
             SELECT doc_id, CAST(span_start AS INT) AS span_start,
                    CAST(span_end AS INT) AS span_end,
                    CAST(span_end - span_start + 1 AS INT) AS span_tokens
             FROM agg WHERE span_end - span_start + 1 >= 12
             ORDER BY 1, 2"""))

  /** Span EXCISION — the destructive half of `text_dup_span_merge`: drop
    * every token inside a detected duplicate span, reassemble the
    * remainder in order, count the survivors. The oracle replays the full
    * detect chain AND the surgery (position-tagged tokens, NOT-EXISTS
    * range anti-join against the span set, order-preserving
    * reassembly), so an off-by-one at either span edge shifts the cut
    * and breaks the clean_text hash character-for-character.
    */
  private val dupSpanExcise = NamedQuery(
    "text_dedup_excise",
    (s, d) =>
      Dedup.exciseDupSpans(Tables.documents(s, d), n = 8, minSpan = 12)
        .orderBy(col("doc_id")),
    Some(s"""WITH tok AS (SELECT doc_id, string_split($normSql, ' ') AS l
                          FROM documents),
             w AS (SELECT doc_id, len(l) AS nt,
                     CASE WHEN len(l) < 8
                          THEN [{'p': 0, 'w': array_to_string(l, ' ')}]
                          ELSE [{'p': i - 1,
                                 'w': array_to_string(l[i:i+7], ' ')}
                                FOR i IN range(1, len(l) - 6)]
                     END AS ws
                   FROM tok),
             occ AS (SELECT doc_id, nt, unnest(ws) AS u FROM w),
             dupw AS (SELECT w FROM (SELECT u.w AS w,
                                            count(DISTINCT doc_id) AS nd
                                     FROM occ GROUP BY 1) WHERE nd >= 2),
             dp AS (SELECT o.doc_id, o.nt, (o.u).p AS pos
                    FROM occ o JOIN dupw d ON (o.u).w = d.w),
             isl AS (SELECT doc_id, nt, pos,
                       CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
                              ORDER BY pos) <= 8 THEN 0 ELSE 1 END AS ns
                     FROM dp),
             sp AS (SELECT doc_id, nt, pos,
                      sum(ns) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS sid
                    FROM isl),
             spans AS (SELECT doc_id, span_start, span_end FROM (
                         SELECT doc_id, sid, min(pos) AS span_start,
                                least(max(pos) + 7, min(nt) - 1) AS span_end
                         FROM sp GROUP BY 1, 2)
                       WHERE span_end - span_start + 1 >= 12),
             tp AS (SELECT doc_id,
                           unnest([{'p': i - 1, 't': l[i]}
                                   FOR i IN range(1, len(l) + 1)]) AS u
                    FROM tok),
             kept AS (SELECT doc_id, (u).p AS p, (u).t AS t FROM tp
                      WHERE NOT EXISTS (SELECT 1 FROM spans s
                              WHERE s.doc_id = tp.doc_id
                                AND (tp.u).p BETWEEN s.span_start
                                                 AND s.span_end))
             SELECT doc_id,
                    array_to_string(list(t ORDER BY p), ' ') AS clean_text,
                    count(*) AS n_tokens_kept
             FROM kept GROUP BY 1 ORDER BY 1"""))

  /** Deterministic 16-shard export manifest over documents, weighted by
    * token count. sum/min/max over doc_id pin the exact membership of
    * every shard, so a single row landing in the wrong shard breaks the
    * hash — this oracles the assignment function itself; the physical
    * write path (file caps, per-file ordering) is pinned in
    * CurationOpsSpec.
    */
  private val exportShards = NamedQuery(
    "export_shards",
    (s, d) =>
      Export.shardSummary(
          Tables.documents(s, d).withColumn("n_tokens",
            graft.functions.TextFunctions.tokenCount(col("text")).cast("long")),
          col("doc_id"), col("n_tokens"), nShards = 16)
        .orderBy(col("shard_id")),
    Some(s"""WITH t AS (SELECT doc_id,
                               CAST(len(string_split($normSql, ' ')) AS BIGINT)
                                 AS n_tokens,
                               list_reduce(list_transform(
                                   string_split(substr(md5(CAST(doc_id AS VARCHAR)),
                                                       1, 6), ''),
                                   c -> strpos('0123456789abcdef', c) - 1),
                                 (a, b) -> a * 16 + b) AS hv
                        FROM documents)
             SELECT CAST(hv % 16 AS INT) AS shard_id,
                    count(*) AS n_rows,
                    CAST(sum(n_tokens) AS BIGINT) AS total_weight,
                    CAST(sum(doc_id) AS BIGINT) AS sum_key,
                    min(doc_id) AS min_key, max(doc_id) AS max_key
             FROM t GROUP BY 1 ORDER BY 1"""))

  /** Epoch-seeded deterministic training order (the step between curation
    * and the data loader): shard membership by unseeded md5(doc_id) —
    * stable across epochs, same assignment export_shards oracles — and
    * intra-shard position by the rank of md5(doc_id ":ep7"), a full
    * reshuffle recomputable from nothing but the seed. The oracle
    * re-derives BOTH hashes in DuckDB, so a row in the wrong shard, a
    * non-contiguous position, or an order drift between engines all break
    * the hash. One exchange (shard routing + per-shard window share it);
    * positions are the (shard, offset) addressing a loader resumes from.
    */
  private val exportOrder = NamedQuery(
    "export_training_order",
    (s, d) =>
      Export.trainingOrder(
          Tables.documents(s, d).select(col("doc_id")),
          col("doc_id"), nShards = 16, seed = "ep7")
        .select(col("doc_id"), col("shard_id"), col("pos"))
        .orderBy(col("shard_id"), col("pos")),
    Some("""WITH t AS (SELECT doc_id,
                              list_reduce(list_transform(
                                  string_split(substr(md5(CAST(doc_id AS VARCHAR)),
                                                      1, 6), ''),
                                  c -> strpos('0123456789abcdef', c) - 1),
                                (a, b) -> a * 16 + b) AS hv,
                              md5(CAST(doc_id AS VARCHAR) || ':ep7') AS rk
                       FROM documents)
            SELECT doc_id, CAST(hv % 16 AS INT) AS shard_id,
                   row_number() OVER (PARTITION BY hv % 16
                                      ORDER BY rk, doc_id) AS pos
            FROM t ORDER BY 2, 3"""))

  /** Out-of-vocabulary token ratio per document against the corpus's
    * top-20 vocabulary — reuses the exact vocabulary cut that
    * text_vocab_topk pins (n DESC, token tiebreak, boundary exercised).
    */
  private val oovRatio = NamedQuery(
    "text_oov_ratio",
    (s, d) =>
      TfIdf.oovStats(Tables.documents(s, d), maxVocab = 20)
        .orderBy(col("doc_id")),
    Some(s"""WITH tok AS (SELECT doc_id,
                                 unnest(string_split($normSql, ' ')) AS w
                          FROM documents),
             v AS (SELECT w AS token FROM (SELECT w, count(*) AS n FROM tok
                                           GROUP BY 1
                                           ORDER BY n DESC, w LIMIT 20))
             SELECT t.doc_id, count(*) AS n_tokens,
                    count(CASE WHEN v.token IS NULL THEN 1 END) AS n_oov,
                    round(count(CASE WHEN v.token IS NULL THEN 1 END) * 1.0
                          / count(*), 4) AS oov_ratio
             FROM tok t LEFT JOIN v ON t.w = v.token
             GROUP BY 1 ORDER BY 1"""))

  /** Shared DuckDB fragment: label centroids (dims rounded to 6, exactly
    * like KMeans.labelCentroids) and the argmin Lloyd assignment, ranked
    * by round(d2, 6) with cluster-id tiebreak — the same deterministic
    * order the engine's array_sort uses.
    */
  private val assignOracleFrag =
    """cents AS (SELECT label AS cl, CAST(i - 1 AS INT) AS dim,
                        round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS cv
                 FROM embeddings, range(1, 65) t(i) GROUP BY 1, 2),
       dist AS (SELECT e.vec_id, c.cl,
                       sum((CAST(e.embedding[c.dim + 1] AS DOUBLE) - c.cv)
                           * (CAST(e.embedding[c.dim + 1] AS DOUBLE) - c.cv))
                         AS d2
                FROM embeddings e, cents c GROUP BY 1, 2),
       best AS (SELECT vec_id, cl, d2,
                       row_number() OVER (PARTITION BY vec_id
                         ORDER BY round(d2, 6), cl) AS rn
                FROM dist)"""

  /** One Lloyd assignment step from the per-label centroids — the
    * SQL-provable parameter point of the k-means family (the iterative
    * fit is spec-pinned in KMeansSpec; its assignment kernel is THIS
    * expression). A wrong distance fold, a wrong tie-break, or
    * un-rounded centroids all break the hash.
    */
  private val kmeansAssign = NamedQuery(
    "cluster_kmeans_assign",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      KMeans.assignStep(emb, KMeans.labelCentroids(emb, "label"))
        .select(col("vec_id"), col("label"),
          col("cluster").as("cluster_label"), round(col("d2"), 4).as("d2"))
        .orderBy(col("vec_id"))
    },
    Some(s"""WITH $assignOracleFrag
             SELECT e.vec_id, e.label, b.cl AS cluster_label,
                    round(b.d2, 4) AS d2
             FROM embeddings e JOIN best b
               ON e.vec_id = b.vec_id AND b.rn = 1
             ORDER BY 1"""))

  /** SemDeDup at the provable parameter point: near-dup cosine pairs
    * blocked by the one-step Lloyd assignment above (the full iterative
    * path is `KMeans.semanticDedupPairs`, spec-pinned). Same 0.4
    * threshold as dedup_embedding_cosine, so the two queries differ only
    * in the blocking: metadata label vs learned cluster.
    */
  private val semanticDedup = NamedQuery(
    "dedup_semantic",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Dedup.embeddingCosinePairs(
          KMeans.assignStep(emb, KMeans.labelCentroids(emb, "label")),
          threshold = 0.4, blockCol = Some("cluster"))
        .orderBy(col("id1"), col("id2"))
    },
    Some(s"""WITH $assignOracleFrag,
             a AS (SELECT e.vec_id, e.embedding, b.cl
                   FROM embeddings e JOIN best b
                     ON e.vec_id = b.vec_id AND b.rn = 1)
             SELECT x.vec_id AS id1, y.vec_id AS id2,
                    round(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                                 CAST(y.embedding AS DOUBLE[])), 4) AS cos
             FROM a x JOIN a y ON x.cl = y.cl AND x.vec_id < y.vec_id
             WHERE list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                          CAST(y.embedding AS DOUBLE[])) >= 0.4
             ORDER BY 1, 2"""))

  /** Bounded production serve of dedup_semantic — same certificate
    * contract as dedup_embedding_cosine_capped but blocked on the LEARNED
    * cluster from the one-step Lloyd assignment instead of the metadata
    * label, so the per-block budget guards the hazard k-means blocking
    * actually has at corpus scale: Lloyd concentrates near-duplicate mass
    * into few clusters, and the hottest cluster's exact pair join is the
    * quadratic term. Cap 1200 sits inside the sf0.01 cluster-size spread
    * (41–63 rows), so both branches are oracle-exercised: clusters of
    * ≤49 rows join exactly, denser ones cull before any pair work.
    */
  private val semanticDedupCapped = NamedQuery(
    "dedup_semantic_capped",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Dedup.embeddingCosineCertificates(
          KMeans.assignStep(emb, KMeans.labelCentroids(emb, "label")),
          threshold = 0.4, maxPairsPerBlock = 1200L, blockCol = "cluster")
        .orderBy(col("block"))
    },
    Some(s"""WITH $assignOracleFrag,
             asg AS (SELECT e.vec_id, e.embedding, b.cl
                     FROM embeddings e JOIN best b
                       ON e.vec_id = b.vec_id AND b.rn = 1),
             c AS (SELECT cl AS block, count(*) AS n_rows FROM asg GROUP BY 1),
             cert AS (SELECT block, n_rows,
                             n_rows * (n_rows - 1) > 2 * 1200 AS culled
                      FROM c),
             p AS (SELECT x.cl AS block, count(*) AS n_pairs
                   FROM asg x JOIN asg y
                     ON x.cl = y.cl AND x.vec_id < y.vec_id
                   WHERE list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                        CAST(y.embedding AS DOUBLE[])) >= 0.4
                     AND x.cl NOT IN (SELECT block FROM cert WHERE culled)
                   GROUP BY 1)
             SELECT c2.block, c2.n_rows, c2.culled,
                    coalesce(p.n_pairs, 0) AS n_pairs
             FROM cert c2 LEFT JOIN p USING (block) ORDER BY block"""))

  val all: Seq[NamedQuery] = Seq(lmScore, dupSpans, dupSpanMerge,
    dupSpanExcise, exportShards, exportOrder, oovRatio, kmeansAssign,
    semanticDedup, semanticDedupCapped)
}
