package graft.queries

import graft.{NamedQuery, Tables}
import graft.operators.{Chunking, Clusters, Decontaminate, Dedup, Fuzzy, Graph, Mixture, Packing, Quantize, Sampling, Sketches, Splits, TfIdf}
import org.apache.spark.sql.functions._

/** Pipeline-curation operators layered on the dedup/text family: duplicate
  * CLUSTER resolution (connected components over near-dup pairs),
  * deterministic sampling (md5 Bernoulli, stratified quotas, weighted
  * A-Res), TF-IDF, sequence packing, leakage-safe splits, int8
  * quantization, PII scrubbing, salted aggregation, sessionization, and
  * exact percentiles. Every query here is deterministic and carries a
  * full DuckDB oracle (the cluster oracles resolve components with a
  * recursive CTE).
  */
object PipelineQueries {

  private val normSql = raw"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"

  /** Df-capped n-gram Jaccard pairs at 0.8 → connected components →
    * (node, cluster_id). The transitive closure is what makes pair-dedup
    * usable: keep one doc per cluster, not "drop both ends of each pair".
    * Candidate generation is the CAPPED inverted index (df ≤ 20): the
    * uncapped variant is quadratic on any stop-shingle, which at corpus
    * scale is the classic dedup scale-killer. The oracle CTE mirrors the
    * same rare-shingle cap.
    */
  private val dedupClusters = NamedQuery(
    "dedup_clusters",
    (s, d) =>
      Clusters.connectedComponents(
          Dedup.ngramJaccardPairsCapped(Tables.documents(s, d), n = 3,
            threshold = 0.8, maxShingleDf = 20),
          "doc1", "doc2")
        .orderBy(col("node")),
    Some(s"""WITH RECURSIVE
             tok AS (SELECT doc_id, string_split($normSql, ' ') AS l FROM documents),
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
                   JOIN sh s2 ON cand.doc2 = s2.doc_id),
             pairs AS (SELECT doc1, doc2 FROM v
                       WHERE common * 1.0 / (n1 + n2 - common) >= 0.8),
             edges AS (SELECT doc1 AS a, doc2 AS b FROM pairs
                       UNION SELECT doc2, doc1 FROM pairs),
             nodes AS (SELECT DISTINCT a AS n FROM edges),
             reach(n, r) AS (
               SELECT n, n FROM nodes
               UNION
               SELECT rc.n, e.b FROM reach rc JOIN edges e ON rc.r = e.a)
             SELECT n AS node, min(r) AS cluster_id FROM reach
             GROUP BY 1 ORDER BY 1"""))

  /** Same duplicate-cluster resolution through the OTHER component
    * algorithm: alternating large-star/small-star rewrites [Kiveris et
    * al., SoCC'14] instead of min-label propagation. Semantics are
    * identical by construction (cluster_id = min reachable id), so the
    * two paths share one oracle — this gate hash-pins their agreement on
    * real near-dup pairs through the driver's DuckDB compare, not just
    * the synthetic-graph spec. Star is the scale path for DEEP graphs
    * (O(log² n) rounds vs O(diameter)): entity-resolution chains, link
    * graphs — shapes where the min-label loop's round count explodes.
    */
  private val dedupClustersStar = NamedQuery(
    "dedup_clusters_star",
    (s, d) =>
      Clusters.connectedComponentsStar(
          Dedup.ngramJaccardPairsCapped(Tables.documents(s, d), n = 3,
            threshold = 0.8, maxShingleDf = 20),
          "doc1", "doc2")
        .orderBy(col("node")),
    dedupClusters.oracle)

  /** Deterministic ~10% Bernoulli sample by md5(doc_id) prefix — same rows
    * on any engine / partition layout (auditable split).
    */
  private val sampleBernoulli = NamedQuery(
    "sample_bernoulli_hash",
    (s, d) =>
      Sampling.hashBernoulli(Tables.documents(s, d), col("doc_id"), 0.1)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id, lang FROM documents
            WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) < '199999'
            ORDER BY doc_id"""))

  /** Deterministic 25-per-language stratified quota, picked by md5 order. */
  private val sampleStratified = NamedQuery(
    "sample_stratified",
    (s, d) =>
      Sampling.stratifiedQuota(
          Tables.documents(s, d).select(col("doc_id"), col("lang")),
          col("lang"), col("doc_id"), n = 25)
        .orderBy(col("doc_id")),
    Some("""WITH r AS (SELECT doc_id, lang,
                              row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
                       FROM documents)
            SELECT doc_id, lang FROM r WHERE rn <= 25 ORDER BY doc_id"""))

  /** BM25 retrieval of a 3-term query over the corpus, top-20 docs — the
    * RAG/passage-retrieval scoring surface (k1=1.2, b=0.75, Lucene idf).
    * The oracle rebuilds the identical cascade; the per-term score fold is
    * FIXED-ORDER on both engines (see TfIdf.bm25TopK), so the hash pins
    * tf, df, dl, avgdl, idf, the saturation curve, and the tiebreak.
    */
  private val bm25TopK = NamedQuery(
    "text_bm25_topk",
    (s, d) =>
      TfIdf.bm25TopK(Tables.documents(s, d),
        terms = Seq("hash", "vector", "spark"), k = 20),
    Some(s"""WITH tokl AS (SELECT doc_id, string_split($normSql, ' ') AS l
                           FROM documents),
             base AS (SELECT doc_id, unnest(l) AS term,
                             CAST(len(l) AS BIGINT) AS dl FROM tokl),
             tf AS (SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
                    FROM base WHERE term IN ('hash', 'vector', 'spark')
                    GROUP BY 1, 2),
             st AS (SELECT count(*) AS n_docs,
                           CAST(sum(len(l)) AS BIGINT) AS sum_dl FROM tokl),
             dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             ct AS (SELECT tf.doc_id, tf.term,
                           ln(1.0 + (st.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
                             * (tf.tf * (1.2 + 1.0))
                             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl
                                 / (CAST(st.sum_dl AS DOUBLE) / st.n_docs)))
                             AS contrib
                    FROM tf JOIN dfq USING (term) CROSS JOIN st),
             pv AS (SELECT doc_id,
                           coalesce(max(CASE WHEN term = 'hash' THEN contrib END), 0.0) AS c0,
                           coalesce(max(CASE WHEN term = 'vector' THEN contrib END), 0.0) AS c1,
                           coalesce(max(CASE WHEN term = 'spark' THEN contrib END), 0.0) AS c2
                    FROM ct GROUP BY 1)
             SELECT doc_id, round(c0 + c1 + c2, 4) AS bm25
             FROM pv ORDER BY round(c0 + c1 + c2, 6) DESC, doc_id
             LIMIT 20"""))

  /** Top-3 TF-IDF terms per document. */
  private val tfidfTopK = NamedQuery(
    "text_tfidf_topk",
    (s, d) =>
      TfIdf.topTerms(Tables.documents(s, d), k = 3)
        .orderBy(col("doc_id"), col("rank")),
    Some(s"""WITH tok AS (SELECT doc_id, unnest(string_split($normSql, ' ')) AS term
                          FROM documents),
             tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
             dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             n AS (SELECT count(*) AS n_docs FROM documents),
             sc AS (SELECT doc_id, term, tf, tf * ln(n_docs * 1.0 / df) AS score
                    FROM tf JOIN dfq USING (term) CROSS JOIN n),
             r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                     ORDER BY round(score, 6) DESC, term) AS rank FROM sc)
             SELECT doc_id, term, tf, round(score, 4) AS tfidf, rank
             FROM r WHERE rank <= 3 ORDER BY doc_id, rank"""))

  /** Streaming-order sequence packing into 2048-token bins; the global
    * running total comes from the two-phase distributed scan, not a
    * single-task window.
    */
  private val packSeq = NamedQuery(
    "pack_sequences",
    (s, d) =>
      Packing.packSequences(Tables.documents(s, d), capacity = 2048)
        .orderBy(col("doc_id")),
    Some(s"""WITH t AS (SELECT doc_id,
                               CAST(len(string_split($normSql, ' ')) AS BIGINT) AS n_tokens
                        FROM documents),
             c AS (SELECT doc_id, n_tokens,
                          sum(n_tokens) OVER (ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
                   FROM t)
             SELECT doc_id, n_tokens,
                    CAST(floor((cum - n_tokens) / 2048.0) AS BIGINT) AS bin_id
             FROM c ORDER BY doc_id"""))

  /** The dedup END PRODUCT: the survivor list after dropping every doc
    * that is not its cluster's representative (min id) — what a curation
    * pipeline actually feeds downstream. Exercises keepList's left-anti
    * join under the oracle gate. Pairs come from the df-capped generator
    * (see dedupClusters); the oracle mirrors the cap.
    */
  private val dedupKeep = NamedQuery(
    "dedup_keeplist",
    (s, d) =>
      Clusters.keepList(
          Tables.documents(s, d),
          Dedup.ngramJaccardPairsCapped(Tables.documents(s, d), n = 3,
            threshold = 0.8, maxShingleDf = 20),
          "doc_id")
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id")),
    Some(s"""WITH RECURSIVE
             tok AS (SELECT doc_id, string_split($normSql, ' ') AS l FROM documents),
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
                   JOIN sh s2 ON cand.doc2 = s2.doc_id),
             pairs AS (SELECT doc1, doc2 FROM v
                       WHERE common * 1.0 / (n1 + n2 - common) >= 0.8),
             edges AS (SELECT doc1 AS a, doc2 AS b FROM pairs
                       UNION SELECT doc2, doc1 FROM pairs),
             nodes AS (SELECT DISTINCT a AS n FROM edges),
             reach(n, r) AS (
               SELECT n, n FROM nodes
               UNION
               SELECT rc.n, e.b FROM reach rc JOIN edges e ON rc.r = e.a),
             drop_ids AS (SELECT n AS doc_id FROM reach
                          GROUP BY 1 HAVING n != min(r))
             SELECT d.doc_id, d.lang FROM documents d
             WHERE d.doc_id NOT IN (SELECT doc_id FROM drop_ids)
             ORDER BY d.doc_id"""))

  /** Quality-aware survivor list: same clusters as dedup_keeplist, but
    * each cluster keeps its LONGEST member (stored n_chars, ties → min
    * id) instead of the min id — the curation default (discard the worse
    * copy; which copy survives changes what a model trains on). The
    * oracle re-derives the argmax winner per cluster, so a wrong winner,
    * a dropped singleton, or a surviving loser all break the hash.
    */
  private val dedupKeepQuality = NamedQuery(
    "dedup_keeplist_quality",
    (s, d) =>
      Clusters.keepListBy(
          Tables.documents(s, d),
          Dedup.ngramJaccardPairsCapped(Tables.documents(s, d), n = 3,
            threshold = 0.8, maxShingleDf = 20),
          "doc_id", col("n_chars"))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id")),
    Some(s"""WITH RECURSIVE
             tok AS (SELECT doc_id, string_split($normSql, ' ') AS l FROM documents),
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
                   JOIN sh s2 ON cand.doc2 = s2.doc_id),
             pairs AS (SELECT doc1, doc2 FROM v
                       WHERE common * 1.0 / (n1 + n2 - common) >= 0.8),
             edges AS (SELECT doc1 AS a, doc2 AS b FROM pairs
                       UNION SELECT doc2, doc1 FROM pairs),
             nodes AS (SELECT DISTINCT a AS n FROM edges),
             reach(n, r) AS (
               SELECT n, n FROM nodes
               UNION
               SELECT rc.n, e.b FROM reach rc JOIN edges e ON rc.r = e.a),
             memb AS (SELECT n, min(r) AS cl FROM reach GROUP BY 1),
             rankm AS (SELECT m.n,
                              row_number() OVER (PARTITION BY m.cl
                                ORDER BY dd.n_chars DESC, m.n) AS rn
                       FROM memb m JOIN documents dd ON dd.doc_id = m.n),
             drop_ids AS (SELECT n AS doc_id FROM rankm WHERE rn > 1)
             SELECT d.doc_id, d.lang, d.n_chars FROM documents d
             WHERE d.doc_id NOT IN (SELECT doc_id FROM drop_ids)
             ORDER BY d.doc_id"""))

  /** Cluster-aware 20% holdout: near-dup clusters (df-capped ngram
    * Jaccard 0.8) never straddle the train/holdout boundary.
    */
  private val splitSafe = NamedQuery(
    "split_leakage_safe",
    (s, d) =>
      Splits.leakageSafeSplit(
          Tables.documents(s, d),
          Dedup.ngramJaccardPairsCapped(Tables.documents(s, d), n = 3,
            threshold = 0.8, maxShingleDf = 20),
          holdoutFraction = 0.2)
        .orderBy(col("doc_id")),
    Some(s"""WITH RECURSIVE
             tok AS (SELECT doc_id, string_split($normSql, ' ') AS l FROM documents),
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
                   JOIN sh s2 ON cand.doc2 = s2.doc_id),
             pairs AS (SELECT doc1, doc2 FROM v
                       WHERE common * 1.0 / (n1 + n2 - common) >= 0.8),
             edges AS (SELECT doc1 AS a, doc2 AS b FROM pairs
                       UNION SELECT doc2, doc1 FROM pairs),
             nodes AS (SELECT DISTINCT a AS n FROM edges),
             reach(n, r) AS (
               SELECT n, n FROM nodes
               UNION
               SELECT rc.n, e.b FROM reach rc JOIN edges e ON rc.r = e.a),
             cc AS (SELECT n AS doc_id, min(r) AS cluster_id FROM reach GROUP BY 1)
             SELECT d.doc_id,
                    coalesce(cc.cluster_id, d.doc_id) AS group_key,
                    CASE WHEN substr(md5(CAST(coalesce(cc.cluster_id, d.doc_id)
                                              AS VARCHAR)), 1, 6) < '333333'
                         THEN 'holdout' ELSE 'train' END AS split
             FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id
             ORDER BY d.doc_id"""))

  /** int8-range scalar quantization of the embedding column, one row per
    * (vector, dimension) — floor-based so both engines agree bit-exactly.
    */
  private val quantize = NamedQuery(
    "vector_quantize_int8",
    (s, d) =>
      Quantize.scalarQuantize(Tables.embeddings(s, d))
        .select(col("vec_id"),
          posexplode(col("codes")).as(Seq("dim", "code")))
        .orderBy(col("vec_id"), col("dim")),
    Some("""WITH mm AS (SELECT vec_id,
                               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                        FROM embeddings),
            b AS (SELECT vec_id, e, list_min(e) AS lo, list_max(e) AS hi FROM mm)
            SELECT vec_id, CAST(i - 1 AS INT) AS dim,
                   CAST(CASE WHEN hi = lo THEN 0
                             ELSE least(255, floor((e[i] - lo) * 256 / (hi - lo)))
                        END AS INT) AS code
            FROM b, range(1, 65) t(i) ORDER BY vec_id, dim"""))

  /** PII scrub + per-class audit counts. Patterns are RE2-compatible so
    * Spark (java.util.regex) and DuckDB (RE2) agree.
    */
  private val scrub = NamedQuery(
    "text_scrub_pii",
    (s, d) => {
      import graft.functions.TextFunctions
      val (ne, nu, nn) = TextFunctions.piiCounts(col("text"))
      Tables.documents(s, d).select(
        col("doc_id"),
        TextFunctions.scrubPii(col("text")).as("scrubbed"),
        ne.as("n_emails"), nu.as("n_urls"), nn.as("n_longnums"))
        .orderBy(col("doc_id"))
    },
    Some {
      val email = raw"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
      val url = raw"https?://[^ ]+"
      val num = raw"[0-9]{6,}"
      s"""SELECT doc_id,
                 regexp_replace(regexp_replace(regexp_replace($normSql,
                   '$email', '<email>', 'g'),
                   '$url', '<url>', 'g'),
                   '$num', '<num>', 'g') AS scrubbed,
                 len(regexp_extract_all($normSql, '$email')) AS n_emails,
                 len(regexp_extract_all(
                   regexp_replace($normSql, '$email', '<email>', 'g'),
                   '$url')) AS n_urls,
                 len(regexp_extract_all(
                   regexp_replace(regexp_replace($normSql,
                     '$email', '<email>', 'g'), '$url', '<url>', 'g'),
                   '$num')) AS n_longnums
          FROM documents ORDER BY doc_id"""
    })

  /** Two-phase salted aggregation — result-identical to the plain
    * groupBy (the oracle IS the plain groupBy), but a hot key spreads
    * over 16 reducers in phase one. l_quantity is integer-valued, so the
    * re-associated double sum is exact.
    */
  private val skewSalted = NamedQuery(
    "skew_salted_agg",
    (s, d) =>
      graft.operators.Skew.saltedCountSum(
          Tables.lineitem(s, d), Seq("l_returnflag"), "l_quantity")
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS total
            FROM lineitem GROUP BY 1 ORDER BY 1"""))

  /** Salted equi JOIN — result-identical to the plain join (the oracle IS
    * the plain join): the skewed fact side scatters each hot event_type
    * over 16 sub-keys, the 5-row dim side replicates to all of them. The
    * dim carries STATIC per-type thresholds (config, not an aggregate) so
    * the filter boundary is a literal — a computed avg threshold would
    * ride on engine-specific summation order and make the strict
    * comparison 1-ulp flaky between Spark and the oracle.
    */
  private val skewSaltedJoin = NamedQuery(
    "skew_salted_join",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"))
      val dims = Seq(("click", 60.0), ("error", 75.0), ("purchase", 50.0),
        ("signup", 40.0), ("view", 55.0)).toDF("event_type", "threshold")
      graft.operators.Skew.saltedJoin(ev, dims, Seq("event_type"))
        .filter(col("value") > col("threshold"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_above"),
             round(sum(col("value")), 2).as("sum_above"))
        .orderBy(col("event_type"))
    },
    Some("""WITH dims(event_type, threshold) AS (
              VALUES ('click', 60.0), ('error', 75.0), ('purchase', 50.0),
                     ('signup', 40.0), ('view', 55.0))
            SELECT e.event_type, count(*) AS n_above,
                   round(sum(e.value), 2) AS sum_above
            FROM events e JOIN dims d ON e.event_type = d.event_type
            WHERE e.value > d.threshold
            GROUP BY 1 ORDER BY 1"""))

  /** Batch sessionization (gaps-and-islands): a new session starts after
    * a >30 min silence. Gap comparison in integer microseconds — no
    * floating-point boundary disagreements between engines.
    */
  private val sessionize = NamedQuery(
    "events_sessionize",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .withColumn("us", expr("unix_micros(ts)"))
        .withColumn("prev", lag(col("us"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev").isNull || col("us") - col("prev") > 1800000000L, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("new_sess")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          expr("unix_millis(min(ts))").as("start_ms"),
          expr("unix_millis(max(ts))").as("end_ms"))
        .orderBy(col("user_id"), col("session_id"))
    },
    Some("""WITH o AS (SELECT user_id, event_id, ts, epoch_us(ts) AS us,
                              lag(epoch_us(ts)) OVER
                                (PARTITION BY user_id ORDER BY ts, event_id) AS prev
                       FROM events),
            f AS (SELECT user_id, event_id, ts,
                         CASE WHEN prev IS NULL OR us - prev > 1800000000
                              THEN 1 ELSE 0 END AS new_sess
                  FROM o),
            s AS (SELECT user_id, ts,
                         CAST(sum(new_sess) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
                  FROM f)
            SELECT user_id, session_id, count(*) AS n_events,
                   epoch_ms(min(ts)) AS start_ms, epoch_ms(max(ts)) AS end_ms
            FROM s GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Exact token-length percentiles per language — the quantile aggregate
    * family (the approx variants run rows-only in approx_stats).
    */
  private val lengthPercentiles = NamedQuery(
    "text_length_percentiles",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("lang"),
          graft.functions.TextFunctions.tokenCount(col("text"))
            .cast("double").as("n"))
        .groupBy(col("lang"))
        .agg(round(expr("percentile(n, 0.25)"), 4).as("p25"),
             round(expr("percentile(n, 0.5)"), 4).as("p50"),
             round(expr("percentile(n, 0.9)"), 4).as("p90"),
             round(expr("percentile(n, 0.99)"), 4).as("p99"))
        .orderBy(col("lang")),
    Some(s"""WITH t AS (SELECT lang,
                               CAST(len(string_split($normSql, ' ')) AS DOUBLE) AS n
                        FROM documents)
             SELECT lang,
                    round(quantile_cont(n, 0.25), 4) AS p25,
                    round(quantile_cont(n, 0.5), 4) AS p50,
                    round(quantile_cont(n, 0.9), 4) AS p90,
                    round(quantile_cont(n, 0.99), 4) AS p99
             FROM t GROUP BY lang ORDER BY lang"""))

  /** Deterministic weighted sample: 20 docs, weight = token count. */
  private val sampleWeighted = NamedQuery(
    "sample_weighted",
    (s, d) =>
      Sampling.weightedTopK(
          Tables.documents(s, d)
            .select(col("doc_id"), col("lang"),
              graft.functions.TextFunctions.tokenCount(col("text"))
                .cast("long").as("n_tokens")),
          col("doc_id"), col("n_tokens"), k = 20)
        .orderBy(col("rank")),
    Some(s"""WITH t AS (SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS h,
                               CAST(len(string_split($normSql, ' ')) AS BIGINT) AS n_tokens
                        FROM documents),
             u AS (SELECT doc_id, lang, n_tokens,
                          list_reduce(list_transform(string_split(h, ''),
                              c -> CAST(ord(c) AS BIGINT)),
                            (a, b) -> (a * 31 + b) % 1000000007)
                            / 1000000007.0 AS uu
                   FROM t),
             p AS (SELECT doc_id, lang, n_tokens,
                          pow(uu, 1.0 / n_tokens) AS priority
                   FROM u),
             r AS (SELECT *, row_number() OVER
                     (ORDER BY round(priority, 8) DESC, doc_id) AS rank
                   FROM p)
             SELECT doc_id, lang, n_tokens, round(priority, 4) AS priority, rank
             FROM r WHERE rank <= 20 ORDER BY rank"""))

  /** Shared DuckDB fragment: benchmark = docs with doc_id % 19 = 0, corpus
    * = the rest; hit counts of shared distinct 3-gram shingles.
    */
  private val decontOracle =
    s"""WITH tok AS (SELECT doc_id, string_split($normSql, ' ') AS l FROM documents),
        sh AS (SELECT doc_id,
                      CASE WHEN len(l) < 3 THEN [array_to_string(l, ' ')]
                           ELSE list_distinct([array_to_string(l[i:i+2], ' ')
                                               FOR i IN range(1, len(l) - 1)])
                      END AS ss
               FROM tok),
        bset AS (SELECT DISTINCT unnest(ss) AS s FROM sh WHERE doc_id % 19 = 0),
        corp AS (SELECT doc_id, unnest(ss) AS s FROM sh WHERE doc_id % 19 != 0)
        SELECT c.doc_id, count(*) AS n_hits
        FROM corp c JOIN bset b USING (s)
        GROUP BY 1 HAVING count(*) >= 5 ORDER BY 1"""

  /** Benchmark decontamination: docs sharing ≥5 distinct 3-gram shingles
    * with the held-out "benchmark" slice (doc_id % 19 = 0) of the corpus.
    */
  private val decontaminate = NamedQuery(
    "decontaminate",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Decontaminate.flagContaminated(
          docs.filter(col("doc_id") % 19 =!= 0),
          docs.filter(col("doc_id") % 19 === 0), n = 3, minHits = 5)
        .orderBy(col("doc_id"))
    },
    Some(decontOracle))

  /** Same contract through the Bloom-prefilter scale path — the sketch must
    * be RESULT-INVISIBLE, so this runs under the identical oracle.
    */
  private val decontaminateBloom = NamedQuery(
    "decontaminate_bloom",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Decontaminate.flagContaminatedBloom(
          docs.filter(col("doc_id") % 19 =!= 0),
          docs.filter(col("doc_id") % 19 === 0), n = 3, minHits = 5)
        .orderBy(col("doc_id"))
    },
    Some(decontOracle))

  /** FUZZY decontamination: corpus docs ≥0.8 n-gram Jaccard to SOME
    * benchmark doc — near-duplicate eval leakage the hit-count contracts
    * are blind to (paraphrase shares most-but-not-all shingles). Emits
    * each contaminated doc's best benchmark match (max Jaccard, ties →
    * min bench id), so the candidate cap, the exact verify, AND the
    * best-match selection all sit under the hash gate. The oracle mirrors
    * the df-capped benchmark index (df over BENCHMARK docs ≤ 20), the
    * size-ratio prune, and the tie rule relationally.
    */
  private val decontaminateFuzzy = NamedQuery(
    "decontaminate_fuzzy",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Decontaminate.flagContaminatedFuzzy(
          docs.filter(col("doc_id") % 19 =!= 0),
          docs.filter(col("doc_id") % 19 === 0),
          n = 3, threshold = 0.8, maxShingleDf = 20)
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH tok AS (SELECT doc_id, string_split($normSql, ' ') AS l
                          FROM documents),
             sh AS (SELECT doc_id,
                           CASE WHEN len(l) < 3 THEN [array_to_string(l, ' ')]
                                ELSE list_distinct([array_to_string(l[i:i+2], ' ')
                                                    FOR i IN range(1, len(l) - 1)])
                           END AS ss
                    FROM tok),
             b AS (SELECT doc_id AS bench_id, ss AS ssb FROM sh
                   WHERE doc_id % 19 = 0),
             c AS (SELECT doc_id, ss AS ssc FROM sh WHERE doc_id % 19 != 0),
             bex AS (SELECT bench_id, len(ssb) AS nb, unnest(ssb) AS s FROM b),
             brare AS (SELECT bex.bench_id, bex.nb, bex.s FROM bex
                       JOIN (SELECT s FROM bex GROUP BY s
                             HAVING count(*) <= 20) r USING (s)),
             cex AS (SELECT doc_id, len(ssc) AS nc, unnest(ssc) AS s FROM c),
             cand AS (SELECT DISTINCT doc_id, bench_id
                      FROM cex JOIN brare USING (s)
                      WHERE least(nc, nb) * 1.0 >= 0.8 * greatest(nc, nb)),
             v AS (SELECT cand.doc_id, cand.bench_id,
                          len(list_intersect(c.ssc, b.ssb)) AS common,
                          len(c.ssc) AS nc, len(b.ssb) AS nb
                   FROM cand JOIN c USING (doc_id) JOIN b USING (bench_id)),
             j AS (SELECT doc_id, bench_id,
                          common * 1.0 / (nc + nb - common) AS jaccard
                   FROM v WHERE common * 1.0 / (nc + nb - common) >= 0.8),
             r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                     ORDER BY jaccard DESC, bench_id) AS rn FROM j)
             SELECT doc_id, bench_id, round(jaccard, 4) AS jaccard
             FROM r WHERE rn = 1 ORDER BY doc_id"""))

  /** Deterministic data mixture: per-source token budgets, docs taken in
    * md5 order until each budget is spent (first doc crossing it included).
    */
  private val mixBudget = NamedQuery(
    "mix_token_budget",
    (s, d) =>
      Mixture.tokenBudgetMix(Tables.documents(s, d),
          budgets = Map("src0" -> 400L, "src1" -> 800L, "src2" -> 1000000L))
        .orderBy(col("doc_id")),
    Some(s"""WITH t AS (SELECT doc_id, source,
                               CAST(len(string_split($normSql, ' ')) AS BIGINT) AS n_tokens
                        FROM documents),
             c AS (SELECT *, coalesce(sum(n_tokens) OVER (
                     PARTITION BY source
                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
                   FROM t)
             SELECT doc_id, source, n_tokens FROM c
             WHERE cum_before < CASE source WHEN 'src0' THEN 400
                                            WHEN 'src1' THEN 800
                                            WHEN 'src2' THEN 1000000
                                            ELSE 0 END
             ORDER BY doc_id"""))

  /** Gopher-style within-doc repetition stats: bigram totals, distinct
    * fraction, and the top bigram's share (operators.Repetition).
    */
  private val repetition = NamedQuery(
    "text_repetition",
    (s, d) =>
      graft.operators.Repetition.bigramStats(Tables.documents(s, d))
        .orderBy(col("doc_id")),
    Some(s"""WITH tok AS (SELECT doc_id, string_split($normSql, ' ') AS l FROM documents),
             bg AS (SELECT doc_id,
                           unnest([l[i] || ' ' || l[i+1] FOR i IN range(1, len(l))]) AS b
                    FROM tok WHERE len(l) >= 2),
             cnt AS (SELECT doc_id, b, count(*) AS n FROM bg GROUP BY 1, 2),
             st AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
                           count(*) AS n_distinct, max(n) AS top_n
                    FROM cnt GROUP BY 1)
             SELECT doc_id, n_bigrams, n_distinct,
                    round(n_distinct * 1.0 / n_bigrams, 4) AS distinct_frac,
                    round(top_n * 1.0 / n_bigrams, 4) AS top_frac
             FROM st ORDER BY doc_id"""))

  /** Overlapping token-window chunking (16-token windows, 4-token
    * overlap): the context-window prep of an LLM pipeline, all narrow
    * codegen HOFs — no shuffle, no UDF. The oracle recomputes every
    * window with list_slice over the same raw-space tokenization, so an
    * off-by-one stride, a lost short tail, or a dropped empty doc all
    * break the hash.
    */
  private val chunkWindows = NamedQuery(
    "text_chunk_windows",
    (s, d) =>
      Chunking.chunkTokens(Tables.documents(s, d), chunkSize = 16,
          overlap = 4)
        .orderBy(col("doc_id"), col("chunk_id")),
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents),
                 c AS (SELECT doc_id, toks,
                              greatest(1, CAST(ceil((len(toks) - 4) / 12.0)
                                               AS INT)) AS nc
                       FROM t),
                 e AS (SELECT doc_id, toks,
                              CAST(unnest(range(0, nc)) AS INT) AS chunk_id
                       FROM c)
            SELECT doc_id, chunk_id,
                   array_to_string(list_slice(toks, chunk_id*12 + 1,
                                              chunk_id*12 + 16),
                                   ' ') AS chunk_text,
                   len(list_slice(toks, chunk_id*12 + 1, chunk_id*12 + 16))
                     AS n_tokens
            FROM e ORDER BY doc_id, chunk_id"""))

  /** Frequency-ranked vocabulary with dense 0-based ids — the id
    * assignment before integer-encoding a corpus. The top-maxVocab cut is
    * TakeOrderedAndProject (per-partition heaps); only the surviving ≤
    * maxVocab rows pass the id window. maxVocab = 20 < the corpus
    * vocabulary (31), so the boundary cut (deterministic under the
    * (n, token) order) is exercised.
    */
  private val vocabTopK = NamedQuery(
    "text_vocab_topk",
    (s, d) =>
      TfIdf.vocabulary(Tables.documents(s, d), maxVocab = 20)
        .orderBy(col("token_id")),
    Some(s"""WITH tok AS (SELECT unnest(string_split($normSql, ' ')) AS token
                          FROM documents),
                  c AS (SELECT token, count(*) AS n FROM tok GROUP BY 1
                        ORDER BY n DESC, token LIMIT 20)
             SELECT token, n,
                    CAST(row_number() OVER (ORDER BY n DESC, token)
                         AS BIGINT) - 1 AS token_id
             FROM c ORDER BY 3"""))

  /** KMV approximate distinct count through the driver gate — an
    * APPROXIMATE aggregate under an EXACT hash compare, which is the
    * point of `Sketches.kmvDistinct`'s portable-hash construction:
    * `approx_count_distinct`'s HLL registers are engine-internal, but the
    * k-minimum-values sketch is pure md5 + sort, so DuckDB rebuilds the
    * identical sketch and the identical (k−1)/u_k estimate. The exact
    * per-group distinct count rides alongside, making the estimator's
    * error visible in the gated result itself (k=64 → ~12% RSE). A wrong
    * k cut, a non-distinct hash feeding the window, or estimate/exact
    * divergence beyond the formula all break the hash.
    */
  private val approxDistinctKmv = NamedQuery(
    "approx_distinct_kmv",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val est = Sketches.kmvDistinct(li, "l_returnflag", "l_partkey", k = 64)
      val exact = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_exact"))
      est.join(exact, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("sketch_size"),
          col("est_distinct"), col("n_exact"))
        .orderBy(col("l_returnflag"))
    },
    Some("""WITH h AS (
              SELECT DISTINCT l_returnflag,
                     list_reduce(list_transform(
                         string_split(md5(CAST(l_partkey AS VARCHAR)), ''),
                         c -> CAST(ord(c) AS BIGINT)),
                       (a, b) -> (a * 31 + b) % 1000000007)
                       / 1000000007.0 AS u
              FROM lineitem),
            r AS (SELECT l_returnflag, u, row_number() OVER
                    (PARTITION BY l_returnflag ORDER BY u) AS rn FROM h),
            s AS (SELECT l_returnflag, count(*) AS sketch_size,
                         max(u) AS uk
                  FROM r WHERE rn <= 64 GROUP BY 1),
            e AS (SELECT l_returnflag, count(DISTINCT l_partkey) AS n_exact
                  FROM lineitem GROUP BY 1)
            SELECT l_returnflag, sketch_size,
                   CASE WHEN sketch_size < 64
                        THEN CAST(sketch_size AS DOUBLE)
                        ELSE round(63.0 / uk, 4) END AS est_distinct,
                   n_exact
            FROM s JOIN e USING (l_returnflag) ORDER BY 1"""))

  /** Portable HyperLogLog distinct estimate (m=256 registers) beside the
    * exact count — the REGISTER-ARRAY sketch itself driver-hash-gated,
    * which `approx_count_distinct`'s engine-private HLL++ can never be.
    * Exactness of the gate rests on two design points pinned in
    * SketchesSpec: the registers are integer/string ops on the shared
    * md5-polynomial hash, and the estimator's Σ2^−rho is dyadic-exact in
    * doubles, so summation order cannot move a bit.
    */
  private val approxDistinctHll = NamedQuery(
    "approx_distinct_hll",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val est = Sketches.hllDistinct(li, "l_returnflag", "l_partkey")
      val exact = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_exact"))
      est.join(exact, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("zeros"), col("est_distinct"),
          col("n_exact"))
        .orderBy(col("l_returnflag"))
    },
    Some("""WITH h AS (
              SELECT l_returnflag,
                     list_reduce(list_transform(
                         string_split(md5(CAST(l_partkey AS VARCHAR)), ''),
                         c -> CAST(ord(c) AS BIGINT)),
                       (a, b) -> (a * 31 + b) % 1000000007) AS hh
              FROM lineitem),
            b AS (SELECT l_returnflag, hh % 256 AS bucket, hh // 256 AS rest
                  FROM h),
            r AS (SELECT l_returnflag, bucket,
                         max(CASE WHEN rest = 0 THEN 23
                                  ELSE 23 - length(format('{:b}', rest)) END)
                           AS m
                  FROM b GROUP BY 1, 2),
            s AS (SELECT l_returnflag, count(*) AS present,
                         sum(power(2.0, -m)) AS sp
                  FROM r GROUP BY 1),
            raw AS (SELECT l_returnflag, 256 - present AS zeros,
                           0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0 /
                             (sp + CAST(256 - present AS DOUBLE)) AS rawe
                    FROM s),
            e AS (SELECT l_returnflag, count(DISTINCT l_partkey) AS n_exact
                  FROM lineitem GROUP BY 1)
            SELECT raw.l_returnflag, raw.zeros,
                   round(CASE WHEN rawe <= 2.5 * 256.0 AND zeros > 0
                              THEN 256.0 * ln(256.0 / zeros)
                              ELSE rawe END, 4) AS est_distinct,
                   e.n_exact
            FROM raw JOIN e USING (l_returnflag) ORDER BY 1"""))

  /** PMI collocations: top-20 adjacent-token bigrams by pointwise mutual
    * information ln(p(ab) / (p(a)·p(b))) with min-support 5 — the
    * phrase-mining signal of a corpus-curation pipeline. All counts are
    * exact integers; PMI is one fixed double expression over their casts
    * (products kept in doubles so no BIGINT overflow cliff at larger SFs),
    * ranked by round-6 PMI with a bigram tiebreak.
    * Scale: bigram and unigram counts are two map-side-combinable
    * groupBys off the same tokenized scan; the two 1-row totals broadcast
    * back; top-20 is TakeOrderedAndProject.
    */
  private val pmiBigrams = NamedQuery(
    "text_pmi_bigrams",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(graft.functions.TextFunctions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 2)
      val uni = toks.select(explode(col("toks")).as("t"))
        .groupBy(col("t")).agg(count(lit(1)).as("c"))
      val bi = toks.select(explode(expr(
          "transform(sequence(1, size(toks) - 1), " +
            "i -> concat(toks[i-1], ' ', toks[i]))")).as("bg"))
        .groupBy(col("bg")).agg(count(lit(1)).as("cab"))
        .filter(col("cab") >= 5)
      val nt = uni.agg(sum(col("c")).as("nt"))
      val nb = toks.agg(sum(size(col("toks")) - lit(1)).as("nb"))
      val first = bi.withColumn("a",
        expr("split_part(bg, ' ', 1)"))
        .withColumn("b", expr("split_part(bg, ' ', 2)"))
      first
        .join(broadcast(uni.select(col("t").as("a"), col("c").as("ca"))), Seq("a"))
        .join(broadcast(uni.select(col("t").as("b"), col("c").as("cb"))), Seq("b"))
        .crossJoin(broadcast(nt)).crossJoin(broadcast(nb))
        .select(col("bg"), col("cab"),
          round(log((col("cab").cast("double") * col("nt") * col("nt")) /
            (col("nb").cast("double") * col("ca") * col("cb"))), 6)
            .as("pmi"))
        .orderBy(col("pmi").desc, col("bg"))
        .limit(20)
    },
    Some(s"""WITH tk AS (SELECT string_split($normSql, ' ') AS l
                         FROM documents),
             tk2 AS (SELECT l FROM tk WHERE len(l) >= 2),
             uni AS (SELECT t, count(*) AS c
                     FROM (SELECT unnest(l) AS t FROM tk2) GROUP BY 1),
             bi AS (SELECT bg, count(*) AS cab
                    FROM (SELECT unnest([l[i] || ' ' || l[i+1]
                                         FOR i IN range(1, len(l))]) AS bg
                          FROM tk2)
                    GROUP BY 1 HAVING count(*) >= 5),
             nt AS (SELECT CAST(sum(c) AS BIGINT) AS nt FROM uni),
             nb AS (SELECT CAST(sum(len(l) - 1) AS BIGINT) AS nb FROM tk2),
             sc AS (SELECT bg, cab,
                           round(ln((CAST(cab AS DOUBLE) * nt.nt * nt.nt) /
                             (CAST(nb.nb AS DOUBLE) * ua.c * ub.c)), 6)
                             AS pmi
                    FROM bi
                    JOIN uni ua ON ua.t = split_part(bg, ' ', 1)
                    JOIN uni ub ON ub.t = split_part(bg, ' ', 2)
                    CROSS JOIN nt CROSS JOIN nb)
             SELECT bg, cab, pmi FROM sc
             ORDER BY pmi DESC, bg LIMIT 20"""))

  /** Edit-distance fuzzy join (`Fuzzy.editDistancePairs`): near-duplicate
    * signature pairs within 3 edits, prefix-blocked and df-capped. The
    * oracle replays the same blocking cascade with DuckDB's levenshtein —
    * both engines run the identical unit-cost edit-distance definition,
    * so every surviving (pair, dist) matches exactly. Spark's side runs
    * the BANDED threshold DP (−1 sentinel past maxDist), which must agree
    * with the oracle's full DP on every admitted pair — the law
    * `FuzzySpec` pins directly.
    */
  private val fuzzyJoin = NamedQuery(
    "text_fuzzy_join",
    (s, d) => Fuzzy.editDistancePairs(
        Tables.documents(s, d), "doc_id", "text",
        sigLen = 16, blockLen = 4, maxDist = 3, maxBlock = 10000)
      .orderBy(col("doc1"), col("doc2")),
    Some("""WITH sig AS (SELECT doc_id,
                           substr(lower(text), 1, 16) AS sig
                         FROM documents),
            blk AS (SELECT *, substr(sig, 1, 4) AS b FROM sig),
            ok AS (SELECT b FROM blk GROUP BY b HAVING count(*) <= 10000)
            SELECT a.doc_id AS doc1, c.doc_id AS doc2,
                   levenshtein(a.sig, c.sig) AS dist
            FROM blk a
            JOIN blk c ON a.b = c.b AND a.doc_id < c.doc_id
            JOIN ok ON ok.b = a.b
            WHERE abs(length(a.sig) - length(c.sig)) <= 3
              AND levenshtein(a.sig, c.sig) <= 3
            ORDER BY 1, 2"""))

  /** Count-Min heavy hitters (`Sketches.cmsSketch/cmsEstimate`): the
    * 4×512 portable-hash grid over l_partkey occurrences, probed for the
    * exact top-10 parts. est_n ≥ n_exact on every row (CMS's one-sided
    * error, also spec-pinned); the oracle rebuilds the identical grid
    * from the identical md5-polynomial hashes, so even the overcounts
    * match exactly. The exact side here is the gate's ground truth — in
    * production the grid REPLACES the exact pass (d·w cells vs a
    * per-key shuffle), which is the entire point at 100 TB.
    */
  private val heavyHittersCms = NamedQuery(
    "heavy_hitters_cms",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val sketch = Sketches.cmsSketch(li, "l_partkey", d = 4, w = 512)
      val top = li.groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("l_partkey"))
        .limit(10)
      val est = Sketches.cmsEstimate(sketch, top, "l_partkey", d = 4, w = 512)
      top.join(est, Seq("l_partkey"))
        .select(col("l_partkey"), col("n_exact"), col("est_n"),
                (col("est_n") - col("n_exact")).as("overcount"))
        .orderBy(col("n_exact").desc, col("l_partkey"))
    },
    // bucket_i = (h + i·(1 + h mod (p−2))) mod p mod w from ONE base
    // md5-polynomial hash per key (Kirsch-Mitzenmacher double hashing) —
    // mirrored verbatim from Sketches.cmsBucket
    Some("""WITH ek AS (SELECT l_partkey, count(*) AS n_exact
                        FROM lineitem GROUP BY 1),
            top AS (SELECT * FROM ek
                    ORDER BY n_exact DESC, l_partkey LIMIT 10),
            hs AS (SELECT unnest([0, 1, 2, 3]) AS i),
            hb AS (SELECT list_reduce(list_transform(
                              string_split(md5(CAST(l_partkey AS VARCHAR)), ''),
                              c -> CAST(ord(c) AS BIGINT)),
                            (a, b) -> (a * 31 + b) % 1000000007) AS h
                   FROM lineitem),
            sk AS (SELECT i,
                          (h + i * (1 + h % 1000000005)) % 1000000007 % 512
                            AS bucket,
                          count(*) AS n
                   FROM hb CROSS JOIN hs GROUP BY 1, 2),
            th AS (SELECT l_partkey,
                          list_reduce(list_transform(
                              string_split(md5(CAST(l_partkey AS VARCHAR)), ''),
                              c -> CAST(ord(c) AS BIGINT)),
                            (a, b) -> (a * 31 + b) % 1000000007) AS h
                   FROM top),
            pr AS (SELECT th.l_partkey, hs.i,
                          (th.h + hs.i * (1 + th.h % 1000000005))
                            % 1000000007 % 512 AS bucket
                   FROM th CROSS JOIN hs),
            est AS (SELECT pr.l_partkey,
                           min(CAST(coalesce(sk.n, 0) AS BIGINT)) AS est_n
                    FROM pr LEFT JOIN sk
                      ON sk.i = pr.i AND sk.bucket = pr.bucket
                    GROUP BY 1)
            SELECT t.l_partkey, t.n_exact, est.est_n,
                   est.est_n - t.n_exact AS overcount
            FROM top t JOIN est USING (l_partkey)
            ORDER BY t.n_exact DESC, t.l_partkey"""))

  /** Fixed-point PageRank (`Graph.pageRankFixedPoint`) over the
    * symmetrized supplier–part purchase graph: five power iterations in
    * BIGINT micro-units, so the oracle's five unrolled SQL iterations
    * land on the IDENTICAL integers (integer addition commutes; double
    * addition would drift per engine and compound per iteration). The
    * top-20 ranking with node-id tiebreak is fully deterministic.
    */
  private val graphPageRank = NamedQuery(
    "graph_pagerank",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val e0 = li
        .select((col("l_suppkey") * 2).as("src"),
                (col("l_partkey") * 2 + 1).as("dst"))
        .distinct()
      val edges = e0.unionByName(
        e0.select(col("dst").as("src"), col("src").as("dst")))
      // ONE narrow map-side-combined pass over the RAW fact table yields
      // both scalars the iteration needs: |V| (distinct encoded node ids
      // — exact, every node of the symmetrized graph appears) and a safe
      // hub-gate upper bound (a node's symmetrized out-degree is its
      // count of DISTINCT partners ≤ its raw occurrence count;
      // overestimates are harmless — salting is lossless). Probing the
      // DERIVED edge set instead re-executed its distinct+union
      // derivation twice (once for |V|, once for the outdeg probe) —
      // measured ~17s of pure re-derivation at sf10.
      val stats = li
        .select(explode(array(col("l_suppkey") * 2,
          col("l_partkey") * 2 + 1)).as("nd"))
        .groupBy(col("nd")).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n"), max(col("c")).as("b")).head()
      Graph.pageRankFixedPoint(edges, stats.getLong(0), iterations = 5,
          maxOutdegHint = Some(stats.getLong(1)))
        .orderBy(col("rank_fp").desc, col("node"))
        .limit(20)
        .select(
          when(col("node") % 2 === 0, "supplier").otherwise("part")
            .as("node_type"),
          expr("node DIV 2").as("key"),
          col("rank_fp"))
    },
    Some("""WITH e0 AS (SELECT DISTINCT l_suppkey * 2 AS src,
                               l_partkey * 2 + 1 AS dst FROM lineitem),
            edges AS (SELECT src, dst FROM e0
                      UNION ALL SELECT dst, src FROM e0),
            deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
            nn AS (SELECT count(DISTINCT src) AS n FROM edges),
            c0 AS (SELECT CAST(1000000000000 // n AS BIGINT) AS init,
                          CAST((15 * (1000000000000 // n)) // 100 AS BIGINT)
                            AS base
                   FROM nn),
            i0 AS (SELECT DISTINCT src AS node,
                          (SELECT init FROM c0) AS r FROM edges),
            i1 AS (SELECT e.dst AS node,
                          CAST((SELECT base FROM c0) +
                               (85 * sum(r.r // d.outdeg)) // 100 AS BIGINT)
                            AS r
                   FROM i0 r JOIN edges e ON e.src = r.node
                             JOIN deg d ON d.src = r.node
                   GROUP BY e.dst),
            i2 AS (SELECT e.dst AS node,
                          CAST((SELECT base FROM c0) +
                               (85 * sum(r.r // d.outdeg)) // 100 AS BIGINT)
                            AS r
                   FROM i1 r JOIN edges e ON e.src = r.node
                             JOIN deg d ON d.src = r.node
                   GROUP BY e.dst),
            i3 AS (SELECT e.dst AS node,
                          CAST((SELECT base FROM c0) +
                               (85 * sum(r.r // d.outdeg)) // 100 AS BIGINT)
                            AS r
                   FROM i2 r JOIN edges e ON e.src = r.node
                             JOIN deg d ON d.src = r.node
                   GROUP BY e.dst),
            i4 AS (SELECT e.dst AS node,
                          CAST((SELECT base FROM c0) +
                               (85 * sum(r.r // d.outdeg)) // 100 AS BIGINT)
                            AS r
                   FROM i3 r JOIN edges e ON e.src = r.node
                             JOIN deg d ON d.src = r.node
                   GROUP BY e.dst),
            i5 AS (SELECT e.dst AS node,
                          CAST((SELECT base FROM c0) +
                               (85 * sum(r.r // d.outdeg)) // 100 AS BIGINT)
                            AS r
                   FROM i4 r JOIN edges e ON e.src = r.node
                             JOIN deg d ON d.src = r.node
                   GROUP BY e.dst)
            SELECT CASE WHEN node % 2 = 0 THEN 'supplier' ELSE 'part' END
                     AS node_type,
                   node // 2 AS key, r AS rank_fp
            FROM i5 ORDER BY rank_fp DESC, node LIMIT 20"""))

  /** Log-linear (HdrHistogram/DDSketch-style) approximate quantiles
    * through the driver gate — the fourth portable sketch (after
    * KMV/CMS/HLL) and the first APPROXIMATE QUANTILE under the exact hash
    * compare, possible only because the bucket key is pure integer
    * arithmetic (msb from binary-string length + prefix shift), never a
    * libm log whose last ulp could flip a boundary bucket on one engine.
    * Per (returnflag, q ∈ {0.5, 0.9, 0.99}): the sketch estimate (bucket
    * midpoint at rank ceil(q·n), ≤ ~3% relative error at s=5) beside the
    * exact percentile_disc cents — the estimator's error visible in the
    * gated result, like the KMV gate. The ceil runs on the same IEEE
    * double q·n in both engines (q forced DOUBLE in the oracle), the
    * established percentile_disc discipline. A wrong bucket boundary, a
    * wrong midpoint reconstruction, or a cumulative-walk off-by-one all
    * break the hash.
    */
  private val approxQuantilesHdr = NamedQuery(
    "approx_quantiles_hdr",
    (s, d) => {
      import graft.operators.Quantiles
      import org.apache.spark.sql.expressions.Window
      val li = Tables.lineitem(s, d).select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      val est = Quantiles.hdrDistinctQuantiles(li, "l_returnflag", "cents",
        qs = Seq(0.5, 0.9, 0.99))
      // EXACT side, two-phase (r11): the old row_number window sorted a
      // whole returnflag partition in ONE task (3 keys — the q34 shape;
      // at sf10 this side, not the sketch, was the 59.8s). percentile_disc
      // at rank r = ceil(q·n) is the smallest value whose cumulative
      // count reaches r, so: (flag, cents) frequency table (map-side
      // combined — the shuffle carries distinct values, not rows), one
      // cumulative-sum window over DISTINCT cents per flag, and the
      // bracketing row cum−c < r ≤ cum. The cumulative sum runs through
      // Quantiles.cumFreq (r12): per-flag domain window below the
      // cardinality gate, range-partitioned two-phase prefix sum past it
      // — the escalation the r11 scaladoc promised, now wired.
      val freq = li.groupBy(col("l_returnflag"), col("cents"))
        .agg(count(lit(1)).as("__c"))
      val cum = Quantiles.cumFreq(freq, Seq("l_returnflag"), "cents", "__c")
      val exact = li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("__n"))
        .select(col("l_returnflag"),
          explode(array(lit(0.5), lit(0.9), lit(0.99))).as("q"), col("__n"))
        .withColumn("__r", ceil(col("q") * col("__n")))
        .join(cum, Seq("l_returnflag"))
        .filter(col("__cum") >= col("__r") &&
          col("__cum") - col("__c") < col("__r"))
        .select(col("l_returnflag"), col("q"), col("cents").as("exact_cents"))
      est.join(exact, Seq("l_returnflag", "q"))
        .select(col("l_returnflag"), col("q"), col("est_cents"),
          col("exact_cents"))
        .orderBy(col("l_returnflag"), col("q"))
    },
    Some("""WITH li AS (SELECT l_returnflag,
                               CAST(round(l_extendedprice * 100) AS BIGINT)
                                 AS cents
                        FROM lineitem),
            b AS (SELECT l_returnflag,
                         CAST(length(bin(cents)) - 1 AS BIGINT) * 64
                         + (cents >> CAST(GREATEST(0,
                              length(bin(cents)) - 1 - 5) AS INTEGER))
                           AS bucket
                  FROM li WHERE cents >= 1),
            sk AS (SELECT l_returnflag, bucket, count(*) AS n
                   FROM b GROUP BY 1, 2),
            cum AS (SELECT l_returnflag, bucket, n,
                           sum(n) OVER (PARTITION BY l_returnflag
                             ORDER BY bucket) AS c,
                           sum(n) OVER (PARTITION BY l_returnflag) AS total
                    FROM sk),
            qq AS (SELECT unnest(CAST([0.5, 0.9, 0.99] AS DOUBLE[])) AS q),
            hit AS (SELECT l_returnflag, q, bucket,
                           row_number() OVER (PARTITION BY l_returnflag, q
                             ORDER BY bucket) AS rn
                    FROM cum, qq
                    WHERE c >= ceil(q * CAST(total AS DOUBLE))),
            est AS (SELECT l_returnflag, q,
                           ((((bucket % 64)
                              << CAST(GREATEST(0, (bucket >> 6) - 5)
                                      AS INTEGER))
                             + (((bucket % 64) + 1)
                                << CAST(GREATEST(0, (bucket >> 6) - 5)
                                        AS INTEGER)) - 1) >> 1)
                             AS est_cents
                    FROM hit WHERE rn = 1),
            rk AS (SELECT l_returnflag, cents,
                          row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY cents) AS rn,
                          count(*) OVER (PARTITION BY l_returnflag) AS n
                   FROM li),
            ex AS (SELECT r.l_returnflag, qq.q, r.cents AS exact_cents
                   FROM rk r, qq
                   WHERE r.rn = CAST(ceil(qq.q * CAST(r.n AS DOUBLE))
                                     AS BIGINT))
            SELECT e.l_returnflag, e.q,
                   CAST(e.est_cents AS BIGINT) AS est_cents,
                   ex.exact_cents
            FROM est e JOIN ex USING (l_returnflag, q)
            ORDER BY 1, 2"""))

  /** Exact triangle count (`Graph.triangleCount`) over the part
    * co-purchase graph — parts are adjacent when some order contains
    * both. The degree-oriented wedge-closing algorithm bounds wedge
    * volume at O(|E|^1.5) regardless of hub degree (each triangle
    * counted once at its (degree, id)-minimum apex); the oracle restates
    * the IDENTICAL orientation relationally, so a wedge double-count, a
    * wrong apex rule, or a closing-join leak all break the hash. The
    * companion counts (nodes, edges, wedges) pin the intermediate
    * volumes, not just the final scalar.
    */
  private val graphTriangles = NamedQuery(
    "graph_triangles",
    (s, d) => {
      import graft.operators.Graph
      val pp = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val edges = pp.as("x").join(pp.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
      // edge ids ⊆ the raw l_partkey domain, so the int-width decision
      // comes off one narrow column scan instead of triangleCount's
      // default probe (which would re-execute the self-join derivation):
      // int at the bench SFs, long on the copy·10¹⁰-shifted sf1/sf10
      // scale corpora
      val b = Tables.lineitem(s, d)
        .agg(max(col("l_partkey")).cast("long"), min(col("l_partkey")).cast("long"))
        .head()
      val fitsInt = !b.isNullAt(0) && b.getLong(0) <= Int.MaxValue &&
        b.getLong(1) >= Int.MinValue
      Graph.triangleCount(edges, compactIds = Some(fitsInt))
    },
    Some("""WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            e AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
                  FROM pp x JOIN pp y
                    ON x.l_orderkey = y.l_orderkey
                   AND x.l_partkey < y.l_partkey),
            deg AS (SELECT n, count(*) AS d
                    FROM (SELECT a AS n FROM e
                          UNION ALL SELECT b FROM e)
                    GROUP BY 1),
            o AS (SELECT CASE WHEN da.d < db.d
                                OR (da.d = db.d AND e.a < e.b)
                              THEN e.a ELSE e.b END AS src,
                         CASE WHEN da.d < db.d
                                OR (da.d = db.d AND e.a < e.b)
                              THEN e.b ELSE e.a END AS dst
                  FROM e JOIN deg da ON da.n = e.a
                         JOIN deg db ON db.n = e.b),
            w AS (SELECT o1.dst AS v, o2.dst AS w2
                  FROM o o1 JOIN o o2
                    ON o1.src = o2.src AND o1.dst < o2.dst),
            t AS (SELECT count(*) AS n_triangles
                  FROM w JOIN e ON e.a = LEAST(w.v, w.w2)
                               AND e.b = GREATEST(w.v, w.w2))
            SELECT (SELECT count(*) FROM deg) AS n_nodes,
                   (SELECT count(*) FROM e) AS n_edges,
                   (SELECT count(*) FROM w) AS n_wedges,
                   t.n_triangles
            FROM t"""))

  val all: Seq[NamedQuery] =
    Seq(dedupClusters, dedupClustersStar, dedupKeep, dedupKeepQuality,
        sampleBernoulli, sampleStratified,
        tfidfTopK, packSeq, splitSafe, quantize, scrub, skewSalted,
        skewSaltedJoin, sessionize, lengthPercentiles, sampleWeighted,
        decontaminate, decontaminateBloom, decontaminateFuzzy,
        mixBudget, repetition,
        chunkWindows, vocabTopK, approxDistinctKmv, fuzzyJoin,
        heavyHittersCms, graphPageRank, bm25TopK, approxDistinctHll,
        pmiBigrams, approxQuantilesHdr, graphTriangles)
}
