package graft.queries

import graft.{NamedQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Statistical + time-series operator family (no reference analogue — the
  * analytics surface a production user reaches next after the relational
  * core): closed-form linear regression / correlation, fixed-width
  * histograms, deterministic mode + exact median, Shannon entropy, EWMA,
  * lag-k autocorrelation, and rolling z-score anomaly flags.
  *
  * Determinism discipline (the thing that makes these hash-gateable): every
  * statistic is computed from EXACT integer/decimal sums — cents-scaled
  * longs summed as decimal(38,0) in Spark, BIGINT→HUGEINT in DuckDB — and
  * the float math happens only AFTER aggregation, as one fixed sequence of
  * IEEE-double ops applied to identical exact inputs on both engines. Sum
  * order, partitioning, and engine accumulation order therefore cannot
  * move a single output bit; rounding is cosmetic, not load-bearing.
  *
  * Scale notes (100 TB intent): each query is one partial-aggregate
  * shuffle from fact rows down to a tiny grouped frame (groups × days);
  * all series math (fold, self-join, window) runs on the reduced frame.
  * Nothing here materializes raw rows past the first groupBy.
  */
object AnalyticsQueries {

  /** Exact decimal(38,0) sum of an integer-valued column/product. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(38,0)"))

  private val dayMs = 86400000.0

  /** Daily event counts per type — the shared reduced frame for the
    * time-series family. Exact epoch-day grain as events_cohort. */
  private def daily(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        expr(s"CAST(floor(unix_millis(ts) / $dayMs) AS BIGINT)").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("cnt"))

  private val dailySql =
    """SELECT event_type,
              CAST(floor(epoch_ms(ts) / 86400000.0) AS BIGINT) AS day,
              count(*) AS cnt
       FROM events GROUP BY 1, 2"""

  // ------------------------------------------------- stats_regression
  // Closed-form OLS y = a + b·x of l_extendedprice on l_quantity per
  // return flag. Inputs are cents-scaled longs (both columns carry ≤2dp),
  // the five moment sums are exact decimals, and slope/intercept/corr are
  // a fixed double formula over those exact sums — the 100-scale cancels
  // in slope and corr, so results are in natural units.
  private val statsRegression = NamedQuery(
    "stats_regression",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          round(col("l_quantity") * 100).cast("long").as("xc"),
          round(col("l_extendedprice") * 100).cast("long").as("yc"))
      val m = li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("double").as("n"),
          dsum(col("xc")).cast("double").as("sx"),
          dsum(col("yc")).cast("double").as("sy"),
          dsum(col("xc").cast("decimal(38,0)") * col("yc")).cast("double").as("sxy"),
          dsum(col("xc").cast("decimal(38,0)") * col("xc")).cast("double").as("sxx"),
          dsum(col("yc").cast("decimal(38,0)") * col("yc")).cast("double").as("syy"))
      m.select(col("l_returnflag"), col("n").cast("long").as("n_rows"),
          round(((col("n") * col("sxy")) - (col("sx") * col("sy"))) /
                ((col("n") * col("sxx")) - (col("sx") * col("sx"))), 6).as("slope"),
          round((col("sy") - (((col("n") * col("sxy")) - (col("sx") * col("sy"))) /
                ((col("n") * col("sxx")) - (col("sx") * col("sx"))) * col("sx"))) /
                (lit(100.0) * col("n")), 4).as("intercept"),
          round(((col("n") * col("sxy")) - (col("sx") * col("sy"))) /
                (sqrt((col("n") * col("sxx")) - (col("sx") * col("sx"))) *
                 sqrt((col("n") * col("syy")) - (col("sy") * col("sy")))), 6).as("corr"))
        .orderBy(col("l_returnflag"))
    },
    Some("""WITH c AS (SELECT l_returnflag,
                              CAST(round(l_quantity * 100) AS BIGINT) AS xc,
                              CAST(round(l_extendedprice * 100) AS BIGINT) AS yc
                       FROM lineitem),
            m AS (SELECT l_returnflag,
                         CAST(count(*) AS DOUBLE) AS n,
                         CAST(sum(xc) AS DOUBLE) AS sx,
                         CAST(sum(yc) AS DOUBLE) AS sy,
                         CAST(sum(xc * yc) AS DOUBLE) AS sxy,
                         CAST(sum(xc * xc) AS DOUBLE) AS sxx,
                         CAST(sum(yc * yc) AS DOUBLE) AS syy
                  FROM c GROUP BY 1)
            SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
                   round(((n * sxy) - (sx * sy)) / ((n * sxx) - (sx * sx)), 6)
                     AS slope,
                   round((sy - (((n * sxy) - (sx * sy)) / ((n * sxx) - (sx * sx)) * sx))
                         / (100.0 * n), 4) AS intercept,
                   round(((n * sxy) - (sx * sy)) /
                         (sqrt((n * sxx) - (sx * sx)) * sqrt((n * syy) - (sy * sy))), 6)
                     AS corr
            FROM m ORDER BY l_returnflag"""))

  // -------------------------------------------------- stats_histogram
  // Fixed-width 10-bucket histogram of o_totalprice on [0, 500000). The
  // bucket is integer arithmetic on cents (no float edge ambiguity), and
  // the share is integer round-half-up basis points:
  // (c·20000 + t) DIV (2t) == round(c·10⁴/t) computed without any float.
  private val statsHistogram = NamedQuery(
    "stats_histogram",
    (s, d) => {
      val b = Tables.orders(s, d)
        .select(expr(
          "CAST(round(o_totalprice * 100) AS BIGINT) DIV 5000000")
          .as("bucket_raw"))
        .select(least(greatest(col("bucket_raw"), lit(0L)), lit(9L)).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
      val t = b.agg(sum(col("cnt")).as("t"))
      b.crossJoin(broadcast(t))
        .select(col("bucket"), col("cnt"),
          expr("CAST((cnt * 20000 + t) DIV (2 * t) AS BIGINT)").as("share_bp"))
        .orderBy(col("bucket"))
    },
    Some("""WITH b AS (SELECT least(greatest(
                                CAST(round(o_totalprice * 100) AS BIGINT)
                                  // 5000000, 0), 9) AS bucket
                       FROM orders),
            g AS (SELECT bucket, count(*) AS cnt FROM b GROUP BY 1),
            t AS (SELECT sum(cnt) AS t FROM g)
            SELECT bucket, cnt,
                   CAST((cnt * 20000 + t.t) // (2 * t.t) AS BIGINT) AS share_bp
            FROM g, t ORDER BY bucket"""))

  // ------------------------------------------------ stats_mode_median
  // Deterministic mode (max count, ties broken by min value — Spark's and
  // DuckDB's built-in mode() are both tie-nondeterministic, so the tiebreak
  // is spelled out as a window) + exact median reported as 2·median in
  // cents: for any even/odd split that quantity is an exact integer, so
  // the gate needs no float rounding at all.
  private val statsModeMedian = NamedQuery(
    "stats_mode_median",
    (s, d) => {
      val o = Tables.orders(s, d)
      val mode = o.groupBy(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("c"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("o_orderpriority"))
            .orderBy(col("c").desc, col("o_orderstatus"))))
        .filter(col("rk") === 1)
        .select(col("o_orderpriority"), col("o_orderstatus").as("mode_status"),
          col("c").as("mode_count"))
      val med = o
        .select(col("o_orderpriority"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .groupBy(col("o_orderpriority"))
        .agg(round(expr("percentile(cents, 0.5D)") * 2).cast("long")
          .as("median_cents_x2"))
      mode.join(med, Seq("o_orderpriority")).orderBy(col("o_orderpriority"))
    },
    Some("""WITH m AS (SELECT o_orderpriority, o_orderstatus AS mode_status,
                              count(*) AS mode_count,
                              row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY count(*) DESC, o_orderstatus) AS rk
                       FROM orders GROUP BY 1, 2),
            q AS (SELECT o_orderpriority,
                         CAST(round(quantile_cont(
                                CAST(round(o_totalprice * 100) AS BIGINT),
                                0.5) * 2) AS BIGINT) AS median_cents_x2
                  FROM orders GROUP BY 1)
            SELECT m.o_orderpriority, m.mode_status, m.mode_count,
                   q.median_cents_x2
            FROM m JOIN q USING (o_orderpriority)
            WHERE m.rk = 1 ORDER BY m.o_orderpriority"""))

  // --------------------------------------------------- stats_entropy
  // Shannon entropy of the event-type mix per day: H = −Σ p·ln p with
  // p = c/n from exact integer counts. ln is the one transcendental in
  // the family — both engines call a ≤1-ulp libm ln on identical doubles,
  // and the ≤5-term sum keeps the noise ~1e-15, far under round-6.
  private val statsEntropy = NamedQuery(
    "stats_entropy",
    (s, d) => {
      val g = daily(s, d)
      val n = g.groupBy(col("day")).agg(sum(col("cnt")).as("n"))
      g.join(n, Seq("day"))
        .select(col("day"),
          (col("cnt").cast("double") / col("n")).as("p"))
        .groupBy(col("day"))
        .agg(round(-sum(col("p") * log(col("p"))), 6).as("entropy"),
          count(lit(1)).as("n_types"))
        .orderBy(col("day"))
    },
    Some(s"""WITH g AS ($dailySql),
             n AS (SELECT day, sum(cnt) AS n FROM g GROUP BY 1),
             p AS (SELECT g.day, CAST(g.cnt AS DOUBLE) / n.n AS p
                   FROM g JOIN n ON g.day = n.day)
             SELECT day, round(-sum(p * ln(p)), 6) AS entropy,
                    count(*) AS n_types
             FROM p GROUP BY day ORDER BY day"""))

  // -------------------------------------------------------- ts_ewma
  // EWMA (α = 0.3, seeded at the first observation) of the daily count
  // series per event type. The recursion s_d = α·c_d + (1−α)·s_{d−1} is
  // order-sensitive, so it runs as a SEQUENTIAL fold on the reduced
  // series: Spark folds a sorted collect_list with the aggregate() HOF;
  // the oracle unrolls the same recursion in a recursive CTE. Identical
  // op sequence on identical doubles ⇒ bit-identical EWMA.
  // Scale: the fold touches (types × days) rows, never raw events; the
  // one big shuffle is the daily partial-count reduction.
  private val tsEwma = NamedQuery(
    "ts_ewma",
    (s, d) => {
      daily(s, d)
        .groupBy(col("event_type"))
        .agg(sort_array(collect_list(struct(col("day"), col("cnt"))))
          .as("series"))
        .select(col("event_type"), expr(
          """aggregate(series,
               CAST(array() AS ARRAY<STRUCT<day: BIGINT, cnt: BIGINT, ewma: DOUBLE>>),
               (acc, x) -> acc || array(named_struct(
                 'day', x.day, 'cnt', x.cnt,
                 'ewma', IF(size(acc) = 0, CAST(x.cnt AS DOUBLE),
                            0.3D * x.cnt + 0.7D * element_at(acc, size(acc)).ewma))))
          """).as("e"))
        .select(col("event_type"), explode(col("e")).as("r"))
        .select(col("event_type"), col("r.day").as("day"),
          col("r.cnt").as("cnt"), round(col("r.ewma"), 6).as("ewma"))
        .orderBy(col("event_type"), col("day"))
    },
    Some(s"""WITH RECURSIVE g AS ($dailySql),
             sr AS (SELECT event_type, day, cnt,
                           row_number() OVER (PARTITION BY event_type
                                              ORDER BY day) AS rn
                    FROM g),
             e AS (SELECT event_type, day, cnt, rn, CAST(cnt AS DOUBLE) AS ewma
                   FROM sr WHERE rn = 1
                   UNION ALL
                   SELECT s.event_type, s.day, s.cnt, s.rn,
                          0.3 * s.cnt + 0.7 * e.ewma
                   FROM sr s JOIN e ON s.event_type = e.event_type
                                   AND s.rn = e.rn + 1)
             SELECT event_type, day, cnt, round(ewma, 6) AS ewma
             FROM e ORDER BY event_type, day"""))

  // ----------------------------------------------------- ts_autocorr
  // Lag-k autocorrelation (k = 1, 7) of the daily count series per event
  // type: Pearson corr of (c_d, c_{d−k}) pairs via the same exact-sum
  // closed form as stats_regression. Pairs come from a self-join on
  // day − k, so calendar gaps drop symmetric pairs on both engines.
  private val tsAutocorr = NamedQuery(
    "ts_autocorr",
    (s, d) => {
      val g = daily(s, d)
      val lags = Seq(1, 7).map { k =>
        val cur = g.select(col("event_type"), col("day"), col("cnt").as("x"))
        val prev = g.select(col("event_type"),
          (col("day") + k).as("day"), col("cnt").as("y"))
        cur.join(prev, Seq("event_type", "day"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).cast("double").as("n"),
            dsum(col("x")).cast("double").as("sx"),
            dsum(col("y")).cast("double").as("sy"),
            dsum(col("x").cast("decimal(38,0)") * col("y")).cast("double").as("sxy"),
            dsum(col("x").cast("decimal(38,0)") * col("x")).cast("double").as("sxx"),
            dsum(col("y").cast("decimal(38,0)") * col("y")).cast("double").as("syy"))
          .select(col("event_type"), lit(k).as("lag"),
            col("n").cast("long").as("n_pairs"),
            round(((col("n") * col("sxy")) - (col("sx") * col("sy"))) /
                  (sqrt((col("n") * col("sxx")) - (col("sx") * col("sx"))) *
                   sqrt((col("n") * col("syy")) - (col("sy") * col("sy")))), 6)
              .as("autocorr"))
      }
      lags.reduce(_.unionByName(_)).orderBy(col("event_type"), col("lag"))
    },
    Some(s"""WITH g AS ($dailySql),
             pr AS (SELECT k.lag, a.event_type, a.cnt AS x, b.cnt AS y
                    FROM (VALUES (1), (7)) k(lag)
                    JOIN g a ON true
                    JOIN g b ON a.event_type = b.event_type
                            AND a.day = b.day + k.lag),
             m AS (SELECT event_type, lag,
                          CAST(count(*) AS DOUBLE) AS n,
                          CAST(sum(x) AS DOUBLE) AS sx,
                          CAST(sum(y) AS DOUBLE) AS sy,
                          CAST(sum(x * y) AS DOUBLE) AS sxy,
                          CAST(sum(x * x) AS DOUBLE) AS sxx,
                          CAST(sum(y * y) AS DOUBLE) AS syy
                   FROM pr GROUP BY 1, 2)
             SELECT event_type, lag, CAST(n AS BIGINT) AS n_pairs,
                    round(((n * sxy) - (sx * sy)) /
                          (sqrt((n * sxx) - (sx * sx)) *
                           sqrt((n * syy) - (sy * sy))), 6) AS autocorr
             FROM m ORDER BY event_type, lag"""))

  // ----------------------------------------------- ts_rolling_zscore
  // 7-day rolling z-score anomaly flags on the daily count series: mean
  // and sample variance come from exact integer window sums (S1, S2 over
  // ROWS 6 PRECEDING..CURRENT, emitted only when the window is full), and
  // z = (7c − S1) / (7·sqrt((7·S2 − S1²)/42)) is the fixed double tail.
  private val tsRollingZscore = NamedQuery(
    "ts_rolling_zscore",
    (s, d) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-6, 0)
      daily(s, d)
        .select(col("event_type"), col("day"), col("cnt"),
          sum(col("cnt")).over(w).as("s1"),
          sum(col("cnt") * col("cnt")).over(w).as("s2"),
          count(lit(1)).over(w).as("wn"))
        .filter(col("wn") === 7)
        // Zero-variance window: every value equals the mean (the current
        // row is IN the window), so the 0/0 is principled 0, not an error.
        .select(col("event_type"), col("day"), col("cnt"),
          when(lit(7L) * col("s2") - col("s1") * col("s1") === 0L, lit(0.0))
            .otherwise(round((lit(7.0) * col("cnt") - col("s1")) /
              (lit(7.0) * sqrt((lit(7.0) * col("s2") - col("s1") * col("s1"))
                / lit(42.0))), 4)).as("z"))
        .withColumn("anomaly", abs(col("z")) >= 2.0)
        .orderBy(col("event_type"), col("day"))
    },
    Some(s"""WITH g AS ($dailySql),
             w AS (SELECT event_type, day, cnt,
                          sum(cnt) OVER win AS s1,
                          sum(cnt * cnt) OVER win AS s2,
                          count(*) OVER win AS wn
                   FROM g
                   WINDOW win AS (PARTITION BY event_type ORDER BY day
                                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
             z AS (SELECT event_type, day, cnt,
                          CASE WHEN 7 * s2 - s1 * s1 = 0 THEN 0.0
                               ELSE round((7.0 * cnt - s1) /
                                 (7.0 * sqrt((7.0 * s2 - s1 * s1) / 42.0)), 4)
                          END AS z
                   FROM w WHERE wn = 7)
             SELECT event_type, day, cnt, z, abs(z) >= 2.0 AS anomaly
             FROM z ORDER BY event_type, day"""))

  // ------------------------------------------------- stats_outliers
  // Tukey-fence outlier detection with NO floats anywhere: quartiles of
  // integer cents interpolate at quarter fractions, so 4·q is an exact
  // integer; the 1.5·IQR fences scale to ×8 integers
  // (lo×8 = 2·p25×4 − 3·iqr×4), and membership tests compare 8·cents
  // against them — pure BIGINT end to end.
  private val statsOutliers = NamedQuery(
    "stats_outliers",
    (s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderpriority"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      val qs = o.groupBy(col("o_orderpriority"))
        .agg(round(expr("percentile(cents, 0.25D)") * 4).cast("long")
            .as("p25_x4"),
          round(expr("percentile(cents, 0.75D)") * 4).cast("long")
            .as("p75_x4"),
          count(lit(1)).as("n"))
        .withColumn("iqr_x4", col("p75_x4") - col("p25_x4"))
        .withColumn("lo_x8", lit(2L) * col("p25_x4") - lit(3L) * col("iqr_x4"))
        .withColumn("hi_x8", lit(2L) * col("p75_x4") + lit(3L) * col("iqr_x4"))
      o.join(qs, Seq("o_orderpriority"))
        .groupBy(col("o_orderpriority"))
        .agg(min(col("p25_x4")).as("p25_x4"),
          min(col("p75_x4")).as("p75_x4"),
          min(col("iqr_x4")).as("iqr_x4"),
          count(when(lit(8L) * col("cents") < col("lo_x8") ||
            lit(8L) * col("cents") > col("hi_x8"), 1)).as("n_outliers"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""WITH c AS (SELECT o_orderpriority,
                              CAST(round(o_totalprice * 100) AS BIGINT)
                                AS cents
                       FROM orders),
            q AS (SELECT o_orderpriority,
                         CAST(round(quantile_cont(cents, 0.25) * 4) AS BIGINT)
                           AS p25_x4,
                         CAST(round(quantile_cont(cents, 0.75) * 4) AS BIGINT)
                           AS p75_x4
                  FROM c GROUP BY 1),
            f AS (SELECT *, p75_x4 - p25_x4 AS iqr_x4,
                         2 * p25_x4 - 3 * (p75_x4 - p25_x4) AS lo_x8,
                         2 * p75_x4 + 3 * (p75_x4 - p25_x4) AS hi_x8
                  FROM q)
            SELECT c.o_orderpriority, min(f.p25_x4) AS p25_x4,
                   min(f.p75_x4) AS p75_x4, min(f.iqr_x4) AS iqr_x4,
                   count(CASE WHEN 8 * c.cents < f.lo_x8
                               OR 8 * c.cents > f.hi_x8 THEN 1 END)
                     AS n_outliers
            FROM c JOIN f USING (o_orderpriority)
            GROUP BY 1 ORDER BY 1"""))

  // -------------------------------------------------- stats_ab_ttest
  // Welch's two-sample t (the A/B-test statistic) between O- and F-status
  // order totals: per-group n/S1/S2 are exact decimal sums over cents;
  // mean, variance, t, and the Welch–Satterthwaite df are one fixed
  // double chain over those exact inputs — deterministic by construction.
  private val statsAbTtest = NamedQuery(
    "stats_ab_ttest",
    (s, d) => {
      val g = Tables.orders(s, d)
        .filter(col("o_orderstatus").isin("O", "F"))
        .select(col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).cast("double").as("n"),
          dsum(col("cents")).cast("double").as("s1"),
          dsum(col("cents").cast("decimal(38,0)") * col("cents"))
            .cast("double").as("s2"))
      def side(st: String, c: String) =
        max(when(col("o_orderstatus") === st, col(c))).as(s"${c}_$st")
      val wide = g.agg(side("O", "n"), side("O", "s1"), side("O", "s2"),
        side("F", "n"), side("F", "s1"), side("F", "s2"))
      val m1 = col("s1_O") / col("n_O")
      val m2 = col("s1_F") / col("n_F")
      val v1 = (col("n_O") * col("s2_O") - col("s1_O") * col("s1_O")) /
        (col("n_O") * (col("n_O") - lit(1.0)))
      val v2 = (col("n_F") * col("s2_F") - col("s1_F") * col("s1_F")) /
        (col("n_F") * (col("n_F") - lit(1.0)))
      val se2 = v1 / col("n_O") + v2 / col("n_F")
      val t = (m1 - m2) / sqrt(se2)
      val dfW = (se2 * se2) /
        ((v1 / col("n_O")) * (v1 / col("n_O")) / (col("n_O") - lit(1.0)) +
         (v2 / col("n_F")) * (v2 / col("n_F")) / (col("n_F") - lit(1.0)))
      wide.select(col("n_O").cast("long").as("n_o"),
        col("n_F").cast("long").as("n_f"),
        round(m1, 4).as("mean_cents_o"), round(m2, 4).as("mean_cents_f"),
        round(t, 6).as("t_stat"), round(dfW, 2).as("welch_df"))
    },
    Some("""WITH c AS (SELECT o_orderstatus,
                              CAST(round(o_totalprice * 100) AS BIGINT)
                                AS cents
                       FROM orders WHERE o_orderstatus IN ('O', 'F')),
            g AS (SELECT o_orderstatus, CAST(count(*) AS DOUBLE) AS n,
                         CAST(sum(cents) AS DOUBLE) AS s1,
                         CAST(sum(cents * cents) AS DOUBLE) AS s2
                  FROM c GROUP BY 1),
            w AS (SELECT max(CASE WHEN o_orderstatus = 'O' THEN n END) AS n_o,
                         max(CASE WHEN o_orderstatus = 'O' THEN s1 END) AS s1_o,
                         max(CASE WHEN o_orderstatus = 'O' THEN s2 END) AS s2_o,
                         max(CASE WHEN o_orderstatus = 'F' THEN n END) AS n_f,
                         max(CASE WHEN o_orderstatus = 'F' THEN s1 END) AS s1_f,
                         max(CASE WHEN o_orderstatus = 'F' THEN s2 END) AS s2_f
                  FROM g),
            m AS (SELECT n_o, n_f,
                         s1_o / n_o AS m1, s1_f / n_f AS m2,
                         (n_o * s2_o - s1_o * s1_o) / (n_o * (n_o - 1.0))
                           AS v1,
                         (n_f * s2_f - s1_f * s1_f) / (n_f * (n_f - 1.0))
                           AS v2
                  FROM w),
            z AS (SELECT *, v1 / n_o + v2 / n_f AS se2 FROM m)
            SELECT CAST(n_o AS BIGINT) AS n_o, CAST(n_f AS BIGINT) AS n_f,
                   round(m1, 4) AS mean_cents_o, round(m2, 4) AS mean_cents_f,
                   round((m1 - m2) / sqrt(se2), 6) AS t_stat,
                   round((se2 * se2) /
                         ((v1 / n_o) * (v1 / n_o) / (n_o - 1.0) +
                          (v2 / n_f) * (v2 / n_f) / (n_f - 1.0)), 2)
                     AS welch_df
            FROM z"""))

  // ------------------------------------------------ stats_chi_square
  // Chi-square independence test of event_type × weekday (epoch-day mod 7
  // — no calendar/timezone surface): O and the E = row·col/total inputs
  // are exact integers; each cell's (O−E)²/E is one deterministic double;
  // and the 35-cell sum folds in FIXED (type, weekday) order on both
  // engines (sorted collect + aggregate() vs ordered list + list_reduce),
  // so accumulation order is pinned, not assumed.
  private val statsChiSquare = NamedQuery(
    "stats_chi_square",
    (s, d) => {
      val cells = Tables.events(s, d)
        .select(col("event_type"),
          expr(s"CAST(floor(unix_millis(ts) / $dayMs) AS BIGINT) % 7")
            .as("wd"))
        .groupBy(col("event_type"), col("wd"))
        .agg(count(lit(1)).as("o"))
      val rt = cells.groupBy(col("event_type")).agg(sum(col("o")).as("rt"))
      val ct = cells.groupBy(col("wd")).agg(sum(col("o")).as("ct"))
      val tot = cells.agg(sum(col("o")).as("t"))
      val contrib = cells.join(rt, Seq("event_type")).join(ct, Seq("wd"))
        .crossJoin(broadcast(tot))
        .select(col("event_type"), col("wd"),
          (col("rt").cast("double") * col("ct") / col("t")).as("e"),
          col("o"))
        .select(col("event_type"), col("wd"),
          ((col("o") - col("e")) * (col("o") - col("e")) / col("e"))
            .as("contrib"))
      // nr/nc derived from the one collected cell array — no multi-
      // count_distinct Expand, no second aggregation
      contrib
        .agg(sort_array(collect_list(
          struct(col("event_type"), col("wd"), col("contrib")))).as("cs"))
        .select(
          round(expr("aggregate(cs, CAST(0.0 AS DOUBLE), " +
            "(a, x) -> a + x.contrib)"), 6).as("chi2"),
          ((size(array_distinct(expr("transform(cs, x -> x.event_type)")))
            - 1) *
           (size(array_distinct(expr("transform(cs, x -> x.wd)"))) - 1))
            .cast("long").as("dof"))
    },
    Some("""WITH cells AS (SELECT event_type,
                                  CAST(floor(epoch_ms(ts) / 86400000.0)
                                    AS BIGINT) % 7 AS wd,
                                  count(*) AS o
                           FROM events GROUP BY 1, 2),
            rt AS (SELECT event_type, sum(o) AS rt FROM cells GROUP BY 1),
            ct AS (SELECT wd, sum(o) AS ct FROM cells GROUP BY 1),
            tt AS (SELECT sum(o) AS t FROM cells),
            con AS (SELECT c.event_type, c.wd,
                           (c.o - CAST(rt.rt AS DOUBLE) * ct.ct / tt.t)
                           * (c.o - CAST(rt.rt AS DOUBLE) * ct.ct / tt.t)
                           / (CAST(rt.rt AS DOUBLE) * ct.ct / tt.t)
                             AS contrib
                    FROM cells c
                    JOIN rt USING (event_type) JOIN ct USING (wd)
                    CROSS JOIN tt)
            SELECT round(list_reduce(
                     list_prepend(CAST(0.0 AS DOUBLE),
                       list(contrib ORDER BY event_type, wd)),
                     (a, x) -> a + x), 6) AS chi2,
                   (count(DISTINCT event_type) - 1)
                     * (count(DISTINCT wd) - 1) AS dof
            FROM con"""))

  val all: Seq[NamedQuery] =
    Seq(statsRegression, statsHistogram, statsModeMedian, statsEntropy,
      tsEwma, tsAutocorr, tsRollingZscore, statsOutliers, statsAbTtest,
      statsChiSquare)
}
