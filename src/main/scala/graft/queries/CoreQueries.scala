package graft.queries

import graft.{NamedQuery, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational operator inventory (SURVEY.md §2.2-§2.6) expressed over
  * the driver corpus: projection/filter, equi/theta/cross/semi/anti/outer
  * joins, aggregation, rollup/cube, window dedup/running/lead-lag, set ops,
  * JSON extraction, time bucketing, as-of join, and the flagship gold-alert
  * chain (window-dedup → broadcast theta join → case-when classify →
  * project, mirroring /root/reference/src/processing/gold_batch_job.py:22-90).
  *
  * Scale notes (100 TB design intent, verified via .explain on local[32]):
  *   - every scan prunes columns + pushes filters (parquet PushedFilters);
  *   - dimension sides of joins are broadcast() explicitly;
  *   - fact-fact joins are equi-keyed (sort-merge/shuffled-hash) with range
  *     residuals, never cross joins;
  *   - aggregates are partial (map-side combine) by construction;
  *   - final orderBy happens on already-reduced outputs (group counts,
  *     top-k via TakeOrderedAndProject), never on raw fact rows.
  */
object CoreQueries {

  /** All double aggregates are rounded identically on both sides so the
    * driver's value hash is immune to float summation-order noise. */
  private def r2(c: Column): Column = round(c, 2)

  /** DuckDB mirror of `TextFunctions.normText` tokenization (the shared
    * normalize-then-split convention of every text oracle). */
  private val normSql = raw"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"

  // ---------------------------------------------------------------- q1
  // TPC-H Q1 shape: full-scan partial aggregation (SURVEY A1-A4).
  private val q1 = NamedQuery(
    "q1_pricing_summary",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          r2(sum(col("l_quantity"))).as("sum_qty"),
          r2(sum(col("l_extendedprice"))).as("sum_base_price"),
          r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_price"),
          r2(avg(col("l_quantity"))).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some("""SELECT l_returnflag, l_linestatus,
            round(sum(l_quantity),2) AS sum_qty,
            round(sum(l_extendedprice),2) AS sum_base_price,
            round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
            round(avg(l_quantity),2) AS avg_qty,
            round(avg(l_discount),4) AS avg_disc,
            count(*) AS count_order
            FROM lineitem GROUP BY 1,2 ORDER BY 1,2"""))

  // ---------------------------------------------------------------- q2
  // Selective filter + narrow projection: PushedFilters + pruned ReadSchema.
  private val q2 = NamedQuery(
    "q2_filter_project",
    (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
                col("l_shipdate") <  lit("1998-04-01").cast("timestamp") &&
                col("l_quantity") < 5.0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
                col("l_extendedprice"), col("l_returnflag"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1998-04-01'
              AND l_quantity < 5.0
            ORDER BY l_orderkey, l_linenumber"""))

  // ---------------------------------------------------------------- q3
  // TPC-H Q3 shape: broadcast dim filter + equi join + agg + top-k.
  private val q3 = NamedQuery(
    "q3_shipping_priority",
    (s, d) => {
      val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1999-01-01").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"),
                 date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
                 col("o_orderpriority"))
        .agg(r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some("""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_orderpriority,
            round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1999-01-01'
              AND l_shipdate > TIMESTAMP '1999-01-01'
            GROUP BY 1,2,3 ORDER BY revenue DESC, l_orderkey LIMIT 10"""))

  // ---------------------------------------------------------------- q4
  // Global top-k: Catalyst plans TakeOrderedAndProject (no full sort).
  private val q4 = NamedQuery(
    "q4_order_topk",
    (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
                col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(5),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
            FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 5"""))

  // ---------------------------------------------------------------- q5
  // TPC-H Q5 shape: 6-table star join, dims broadcast, facts equi-joined.
  private val q5 = NamedQuery(
    "q5_local_supplier_volume",
    (s, d) => {
      val reg = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val nat = Tables.nation(s, d)
      val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
      val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val li = Tables.lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup),
          col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"))
        .orderBy(col("n_name"))
    },
    Some("""SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------- q6
  // THE reference idiom (SURVEY W1, gold_batch_job.py:32-35): latest row
  // per key via row_number over desc-ordered window. Timestamps are
  // compared at ms precision on both engines (parquet ns → Spark µs; both
  // floor to the same ms), with event_id as a total-order tiebreak.
  private val q6 = NamedQuery(
    "q6_latest_per_key",
    (s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("ts_ms", unix_millis(col("ts")))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ms").desc, col("event_id").desc)
      ev.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"),
                r2(col("value")).as("value"), col("ts_ms"))
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id, event_id, event_type, round(value,2) AS value, ts_ms
            FROM (SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms,
                         row_number() OVER (PARTITION BY user_id
                           ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
                  FROM events)
            WHERE rn = 1 ORDER BY user_id"""))

  // ---------------------------------------------------------------- q7
  // Running total per key (explicit ROWS frame on both engines).
  private val q7 = NamedQuery(
    "q7_running_total",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
                r2(sum(col("o_totalprice")).over(w)).as("running_total"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
            round(sum(o_totalprice) OVER (PARTITION BY o_custkey
              ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_total
            FROM orders ORDER BY o_custkey, o_orderkey"""))

  // ---------------------------------------------------------------- q8
  // lead/lag analytics.
  private val q8 = NamedQuery(
    "q8_lead_lag",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
                lag(col("o_totalprice"), 1).over(w).as("prev_price"),
                lead(col("o_totalprice"), 1).over(w).as("next_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice,
            lag(o_totalprice, 1) OVER w AS prev_price,
            lead(o_totalprice, 1) OVER w AS next_price
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
            ORDER BY o_custkey, o_orderkey"""))

  // ---------------------------------------------------------------- q9
  // Theta band join (SURVEY J2) done scalably: the equi key carries the
  // shuffle, the band predicate is a join residual — NOT a cross join.
  // r12: the equi key is (nationkey, balance CELL), not nationkey alone.
  // With 25 fixed nations, nationkey-only hashing makes every customer
  // probe ALL suppliers of its nation — Σ cust_n·sup_n band evaluations,
  // 100×/decade under linear growth of both sides (measured 34×/decade
  // at the sf10 sweep, ~6·10⁹ evaluations). Bucketing balances into
  // width-100 cells (= the band width) and exploding the BROADCAST side
  // to its cell±1 neighborhood is lossless — |c−s| < 100 forces
  // floor(c/100) ∈ {floor(s/100)−1, …+1}, and the three probe cells are
  // distinct so no pair can match twice — while candidates shrink to the
  // cell neighborhood (~3 cells of ~110). Same trick as the geo grid
  // join and IntervalJoin: fixed-key theta → (key, cell) equi + residual.
  private val q9 = NamedQuery(
    "q9_theta_band_join",
    (s, d) => {
      val sup = Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"),
          floor(col("s_acctbal") / 100.0).cast("long").as("s_cell"))
        .withColumn("probe_cell", explode(array(
          col("s_cell") - 1, col("s_cell"), col("s_cell") + 1)))
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
          floor(col("c_acctbal") / 100.0).cast("long").as("c_cell"))
      cust.join(broadcast(sup),
          col("c_nationkey") === col("s_nationkey") &&
          col("c_cell") === col("probe_cell") &&
          abs(col("c_acctbal") - col("s_acctbal")) < 100.0)
        .groupBy(col("s_suppkey"))
        // ORDER- and ENGINE-STABLE mean (r7 sweep residual, closed):
        // balances are exact 2-decimal values, so the group mean is the
        // rational sum_cents / n — and some groups land EXACTLY on a
        // half-cent, where `round(avg(double), 2)` legitimately disagrees
        // between engines (Spark HALF_UPs the exact decimal expansion;
        // DuckDB rounds after multiplying by 10^k, which itself crosses
        // the half). So the mean is computed in integer cents end to end:
        // exact long sum (partial-agg-order independent), then explicit
        // round-half-away-from-zero by integer arithmetic — floor of the
        // double quotient is exact here (operands < 2^53 and the true
        // quotient is never within an ulp of an integer it doesn't equal).
        .agg(count(lit(1)).as("n_close_customers"),
             sum(round(col("c_acctbal") * 100).cast("long")).as("sum_cents"))
        .withColumn("avg_cust_bal",
          (when(col("sum_cents") < 0, lit(-1L)).otherwise(lit(1L)) *
            floor((abs(col("sum_cents")) * 2 + col("n_close_customers"))
              / (col("n_close_customers") * 2)).cast("long")).cast("double")
            / 100.0)
        .select(col("s_suppkey"), col("n_close_customers"),
          col("avg_cust_bal"))
        .orderBy(col("s_suppkey"))
    },
    Some("""WITH j AS (SELECT s_suppkey,
                              CAST(round(c_acctbal * 100) AS BIGINT) AS cents
                       FROM customer JOIN supplier
                         ON c_nationkey = s_nationkey
                        AND abs(c_acctbal - s_acctbal) < 100.0),
                 g AS (SELECT s_suppkey, count(*) AS n_close_customers,
                              sum(cents) AS sum_cents FROM j GROUP BY 1)
            SELECT s_suppkey, n_close_customers,
                   CAST((CASE WHEN sum_cents < 0 THEN -1 ELSE 1 END
                         * ((abs(sum_cents) * 2 + n_close_customers)
                            // (n_close_customers * 2))) AS DOUBLE) / 100.0
                     AS avg_cust_bal
            FROM g ORDER BY 1"""))

  // ---------------------------------------------------------------- q10
  // Intentional cross join of two tiny dims (SURVEY J1) →
  // BroadcastNestedLoopJoin, same plan family as the reference's
  // fires×stations crossJoin (gold_batch_job.py:52).
  private val q10 = NamedQuery(
    "q10_cross_join_small",
    (s, d) =>
      Tables.region(s, d).select(col("r_name"))
        .crossJoin(broadcast(Tables.nation(s, d).select(col("n_name"))))
        .orderBy(col("r_name"), col("n_name")),
    Some("""SELECT r_name, n_name FROM region CROSS JOIN nation
            ORDER BY r_name, n_name"""))

  // ---------------------------------------------------------------- q11/q12
  // Semi / anti joins (EXISTS / NOT EXISTS).
  private val q11 = NamedQuery(
    "q11_semi_join",
    (s, d) => {
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      Tables.customer(s, d)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
            WHERE EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
            ORDER BY c_custkey"""))

  private val q12 = NamedQuery(
    "q12_anti_join",
    (s, d) => {
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      Tables.customer(s, d)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
            ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q13
  // TPC-H Q13 shape: left outer join preserving zero-order customers.
  private val q13 = NamedQuery(
    "q13_outer_join_count",
    (s, d) => {
      val ord = Tables.orders(s, d).select("o_orderkey", "o_custkey")
      Tables.customer(s, d).select("c_custkey")
        .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""SELECT c_count, count(*) AS custdist
            FROM (SELECT c_custkey, count(o_orderkey) AS c_count
                  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
                  GROUP BY 1)
            GROUP BY 1 ORDER BY custdist DESC, c_count DESC"""))

  // ---------------------------------------------------------------- q14-q17
  // Distinct + set operations (SURVEY §2.6).
  private val q14 = NamedQuery(
    "q14_distinct",
    (s, d) =>
      Tables.customer(s, d)
        .select(col("c_nationkey"), col("c_mktsegment")).distinct()
        .orderBy(col("c_nationkey"), col("c_mktsegment")),
    Some("""SELECT DISTINCT c_nationkey, c_mktsegment FROM customer ORDER BY 1, 2"""))

  private val q15 = NamedQuery(
    "q15_union",
    (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .union(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .distinct()
        .orderBy(col("nationkey")),
    Some("""SELECT c_nationkey AS nationkey FROM customer
            UNION SELECT s_nationkey FROM supplier ORDER BY nationkey"""))

  private val q16 = NamedQuery(
    "q16_intersect",
    (s, d) =>
      Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"))
        .intersect(
          Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
            .select(col("o_orderkey")))
        .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
            INTERSECT
            SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
            ORDER BY o_orderkey"""))

  private val q17 = NamedQuery(
    "q17_except",
    (s, d) =>
      Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"))
        .except(
          Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
            .select(col("o_orderkey")))
        .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
            EXCEPT
            SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
            ORDER BY o_orderkey"""))

  // ---------------------------------------------------------------- q18/q19
  // Rollup / cube (multi-level aggregates in one pass).
  private val q18 = NamedQuery(
    "q18_rollup",
    (s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(r2(sum(col("l_quantity"))).as("sum_qty"), count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
                coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
                col("sum_qty"), col("n"))
        .orderBy(col("returnflag"), col("linestatus")),
    Some("""SELECT coalesce(l_returnflag,'ALL') AS returnflag,
                   coalesce(l_linestatus,'ALL') AS linestatus,
                   sum_qty, n
            FROM (SELECT l_returnflag, l_linestatus,
                         round(sum(l_quantity),2) AS sum_qty, count(*) AS n
                  FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus))
            ORDER BY returnflag, linestatus"""))

  private val q19 = NamedQuery(
    "q19_cube",
    (s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), r2(sum(col("o_totalprice"))).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
                coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
                col("n"), col("total"))
        .orderBy(col("status"), col("priority")),
    Some("""SELECT coalesce(o_orderstatus,'ALL') AS status,
                   coalesce(o_orderpriority,'ALL') AS priority, n, total
            FROM (SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                         round(sum(o_totalprice),2) AS total
                  FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority))
            ORDER BY status, priority"""))

  // ---------------------------------------------------------------- q20
  // Chained CASE WHEN classifier — the exact shape of the reference's
  // 30-30-30 risk rule (gold_batch_job.py:63-74, SURVEY P6), including the
  // >=/<= boundary semantics.
  private val q20 = NamedQuery(
    "q20_case_classify",
    (s, d) =>
      Tables.lineitem(s, d)
        .withColumn("risk_level",
          when(col("l_returnflag") === "R" && col("l_quantity") >= 30.0 &&
               col("l_discount") >= 0.05 && col("l_tax") <= 0.03, "EXTREME")
          .when(col("l_returnflag") === "R" && col("l_quantity") >= 30.0, "VERY_HIGH")
          .when(col("l_returnflag") === "R" && col("l_quantity") >= 20.0, "HIGH")
          .when(col("l_returnflag") === "R", "MODERATE")
          .otherwise("LOW"))
        .groupBy(col("risk_level"))
        .agg(count(lit(1)).as("n"), r2(sum(col("l_extendedprice"))).as("exposure"))
        .orderBy(col("risk_level")),
    Some("""SELECT CASE
              WHEN l_returnflag='R' AND l_quantity>=30.0 AND l_discount>=0.05 AND l_tax<=0.03 THEN 'EXTREME'
              WHEN l_returnflag='R' AND l_quantity>=30.0 THEN 'VERY_HIGH'
              WHEN l_returnflag='R' AND l_quantity>=20.0 THEN 'HIGH'
              WHEN l_returnflag='R' THEN 'MODERATE'
              ELSE 'LOW' END AS risk_level,
            count(*) AS n, round(sum(l_extendedprice),2) AS exposure
            FROM lineitem GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------- q21
  // JSON extraction from a string column (events.props, SURVEY §1.2).
  private val q21 = NamedQuery(
    "q21_json_extract",
    (s, d) =>
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type")),
    Some("""SELECT event_type, count(*) AS n,
                   CAST(sum(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS BIGINT) AS sum_k,
                   max(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS max_k
            FROM events GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------- q22
  // Tumbling time-bucket aggregation — the batch twin of the streaming
  // windowed agg (SURVEY ST5). Bucket emitted as epoch ms for parity.
  private val q22 = NamedQuery(
    "q22_time_bucket",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(unix_millis(date_trunc("hour", col("ts"))).as("bucket_ms"),
                 col("event_type"))
        .agg(count(lit(1)).as("n"), r2(sum(col("value"))).as("sum_value"))
        .orderBy(col("bucket_ms"), col("event_type")),
    Some("""SELECT epoch_ms(date_trunc('hour', ts)) AS bucket_ms, event_type,
                   count(*) AS n, round(sum(value),2) AS sum_value
            FROM events GROUP BY 1,2 ORDER BY 1,2"""))

  // ---------------------------------------------------------------- q23
  // Membership filter (SURVEY P9: dashboard isin).
  private val q23 = NamedQuery(
    "q23_isin_filter",
    (s, d) =>
      Tables.events(s, d)
        .filter(col("event_type").isin("error", "purchase"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), r2(avg(col("value"))).as("avg_value"))
        .orderBy(col("event_type")),
    Some("""SELECT event_type, count(*) AS n, round(avg(value),2) AS avg_value
            FROM events WHERE event_type IN ('error','purchase')
            GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------- q24
  // Synthetic concat key (SURVEY P10: fire_id = lat_lon).
  private val q24 = NamedQuery(
    "q24_concat_key",
    (s, d) =>
      Tables.events(s, d)
        .withColumn("ukey", concat_ws("_", col("user_id"), col("event_type")))
        .groupBy(col("ukey"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("ukey")),
    Some("""SELECT concat_ws('_', user_id, event_type) AS ukey, count(*) AS n
            FROM events GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------- q25
  // One-pass conditional KPIs (SURVEY A2/A3: dashboard filtered counts).
  private val q25 = NamedQuery(
    "q25_conditional_kpi",
    (s, d) =>
      Tables.events(s, d)
        .agg(count(when(col("event_type") === "error", 1)).as("n_errors"),
             count(when(col("event_type") === "purchase", 1)).as("n_purchases"),
             r2(avg(col("value"))).as("avg_value"),
             r2(sum(when(col("event_type") === "error", col("value"))
               .otherwise(0.0))).as("error_value")),
    Some("""SELECT count(CASE WHEN event_type='error' THEN 1 END) AS n_errors,
                   count(CASE WHEN event_type='purchase' THEN 1 END) AS n_purchases,
                   round(avg(value),2) AS avg_value,
                   round(sum(CASE WHEN event_type='error' THEN value ELSE 0.0 END),2) AS error_value
            FROM events"""))

  // ---------------------------------------------------------------- q26
  // As-of join (SURVEY J3): for each purchase, the user's most recent prior
  // click. Implemented shuffle-once: union both sides, one window pass per
  // user ordered by a composite ms+id key — no self-join, no cross product.
  // At 100 TB this is the canonical "sorted-merge over a single shuffle"
  // as-of pattern.
  private val q26 = NamedQuery(
    "q26_asof_join",
    (s, d) => {
      // ordering by the (ms, event_id) STRUCT instead of an arithmetic
      // ms*1e6+id composite: the packed form silently corrupts the order
      // once event_id reaches 1e6 (any corpus beyond ~1M events); struct
      // max is lexicographic and id-range-proof in both engines
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
                unix_millis(col("ts")).as("ms"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ms"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("lc",
          max(when(col("event_type") === "click",
            struct(col("ms").as("ms"), col("event_id").as("eid")))).over(w))
        .filter(col("event_type") === "purchase" && col("lc").isNotNull)
        .select(col("event_id"), col("user_id"), r2(col("value")).as("purchase_value"),
                col("lc.ms").as("last_click_ms"), col("lc.eid").as("last_click_id"))
        .orderBy(col("event_id"))
    },
    Some("""WITH u AS (
              SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ms
              FROM events WHERE event_type IN ('click','purchase')),
            w AS (
              SELECT *, max(CASE WHEN event_type='click'
                                 THEN struct_pack(ms := ms, eid := event_id) END)
                OVER (PARTITION BY user_id ORDER BY ms, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lc
              FROM u)
            SELECT event_id, user_id, round(value,2) AS purchase_value,
                   lc.ms AS last_click_ms, lc.eid AS last_click_id
            FROM w WHERE event_type='purchase' AND lc IS NOT NULL
            ORDER BY event_id"""))

  // Pivot: long → wide on a bounded value list. Explicit values keep the
  // output schema static (no extra distinct-scan job, plan known at
  // compile time — at scale the values-discovery pass is a full extra
  // scan), and map 1:1 onto the oracle's CASE aggregation.
  private val q27 = NamedQuery(
    "q27_pivot",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy(col("user_id")),
    Some("""SELECT user_id,
                   count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
                   count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
                   count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
                   count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
                   count(CASE WHEN event_type = 'view' THEN 1 END) AS view
            FROM events GROUP BY user_id ORDER BY user_id"""))

  // ------------------------------------------------------------- q31
  // UNPIVOT/melt — q27's inverse and the one relational reshape the
  // inventory lacked: three lineitem measure columns melt into
  // (metric, value) long format through Dataset.unpivot (Catalyst Expand,
  // the shape's definition — one pass, no join, no shuffle before the
  // slice filter, which pushes to the scan). The oracle restates the melt
  // as the canonical 3-way UNION ALL, so a dropped measure, a
  // wrong-column value, or id-column duplication all break the hash.
  private val q31 = NamedQuery(
    "q31_unpivot_melt",
    (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 200)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "metric", "value")
        .select(col("l_orderkey"), col("l_linenumber"), col("metric"),
          round(col("value"), 2).as("value"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric")),
    Some("""WITH src AS (SELECT * FROM lineitem WHERE l_orderkey < 200),
            m AS (
              SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
                     l_quantity AS value FROM src
              UNION ALL
              SELECT l_orderkey, l_linenumber, 'l_extendedprice',
                     l_extendedprice FROM src
              UNION ALL
              SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
              FROM src)
            SELECT l_orderkey, l_linenumber, metric,
                   round(value, 2) AS value
            FROM m ORDER BY 1, 2, 3"""))

  // ---------------------------------------------------------------- q28
  // Generic interval-overlap join (the variable-length completion of the
  // range-join family: banded theta = fixed width, as-of = point probe).
  // Two event samples carry [value, value + 1 + f(id)]-length intervals;
  // IntervalJoin grid-buckets both sides and meets them in ONE equi join,
  // deduping multi-bucket pairs by the overlap-start-bucket trick (no
  // distinct shuffle, no BNLJ). Oracle = the plain theta join.
  private val q28 = NamedQuery(
    "q28_interval_overlap",
    (s, d) => {
      val ev = Tables.events(s, d)
      def side(m: Int, mod: Int, p: String) = ev
        .filter(col("event_id") % 100 === m)
        .select(col("event_id").as(s"${p}_id"),
          col("value").as(s"${p}_start"),
          (col("value") + lit(1) +
            expr(s"CAST((event_id DIV 100) % $mod AS DOUBLE)"))
            .as(s"${p}_end"))
      graft.operators.IntervalJoin.overlapJoin(
          side(0, 9, "a"), "a_start", "a_end",
          side(1, 7, "b"), "b_start", "b_end", bucketWidth = 8.0)
        .select(col("a_id"), col("b_id"),
          greatest(col("a_start"), col("b_start")).as("overlap_start"),
          least(col("a_end"), col("b_end")).as("overlap_end"))
        .orderBy(col("a_id"), col("b_id"))
    },
    Some("""WITH a AS (SELECT event_id AS a_id, value AS a_start,
                              value + 1 + (event_id // 100) % 9 AS a_end
                       FROM events WHERE event_id % 100 = 0),
                 b AS (SELECT event_id AS b_id, value AS b_start,
                              value + 1 + (event_id // 100) % 7 AS b_end
                       FROM events WHERE event_id % 100 = 1)
            SELECT a_id, b_id,
                   greatest(a_start, b_start) AS overlap_start,
                   least(a_end, b_end) AS overlap_end
            FROM a JOIN b ON a_start <= b_end AND b_start <= a_end
            ORDER BY 1, 2"""))

  // --------------------------------------------------------- q28_capped
  // The bounded PRODUCTION serve of the interval-overlap join — the same
  // relationship gold_alerts_capped has to gold_alerts. q28's raw pair
  // output is density-quadratic under fixed value range (measured 83.7k
  // → 8.37M → 837M pairs across sf0.1→sf10, exactly 100×/decade), so
  // the serve a pipeline would actually run applies IntervalJoin's
  // maxPairsPerBucket guard (dense buckets culled BEFORE the join from
  // two narrow per-bucket counts — the quadratic work is never
  // performed) and emits a per-bucket CERTIFICATE instead of raw pairs:
  // (bucket, side counts, culled?, surviving-pair count), bounded by
  // the bucket count (grows with the value RANGE, not the row count).
  // Cull attribution is exact: a pair survives iff its overlap-START
  // bucket is sparse — both its exploded copies necessarily live there,
  // and the oracle mirrors that rule verbatim.
  private val q28capped = NamedQuery(
    "q28_interval_overlap_capped",
    (s, d) => {
      val ev = Tables.events(s, d)
      def side(m: Int, mod: Int, p: String) = ev
        .filter(col("event_id") % 100 === m)
        .select(col("event_id").as(s"${p}_id"),
          col("value").as(s"${p}_start"),
          (col("value") + lit(1) +
            expr(s"CAST((event_id DIV 100) % $mod AS DOUBLE)"))
            .as(s"${p}_end"))
      val a = side(0, 9, "a")
      val b = side(1, 7, "b")
      val bw = 8.0
      val cap = 64L
      def counts(df: org.apache.spark.sql.DataFrame, st: String,
          en: String, out: String) = df
        .withColumn("bucket", explode(sequence(
          floor(col(st) / bw).cast("long"),
          floor(col(en) / bw).cast("long"))))
        .groupBy("bucket").agg(count(lit(1)).as(out))
      val pairs = graft.operators.IntervalJoin.overlapJoin(
          a, "a_start", "a_end", b, "b_start", "b_end",
          bucketWidth = bw, maxPairsPerBucket = Some(cap))
        .select(floor(greatest(col("a_start"), col("b_start")) / bw)
          .cast("long").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n_pairs"))
      counts(a, "a_start", "a_end", "n_left")
        .join(counts(b, "b_start", "b_end", "n_right"), "bucket")
        .withColumn("culled", col("n_left") * col("n_right") > cap)
        .join(pairs, Seq("bucket"), "left_outer")
        .select(col("bucket"), col("n_left"), col("n_right"),
          col("culled"), coalesce(col("n_pairs"), lit(0L)).as("n_pairs"))
        .orderBy(col("bucket"))
    },
    Some("""WITH a AS (SELECT event_id AS a_id, value AS a_start,
                              value + 1 + (event_id // 100) % 9 AS a_end
                       FROM events WHERE event_id % 100 = 0),
                 b AS (SELECT event_id AS b_id, value AS b_start,
                              value + 1 + (event_id // 100) % 7 AS b_end
                       FROM events WHERE event_id % 100 = 1),
                 la AS (SELECT unnest(range(CAST(floor(a_start/8) AS BIGINT),
                                            CAST(floor(a_end/8) AS BIGINT) + 1))
                          AS bucket FROM a),
                 lb AS (SELECT unnest(range(CAST(floor(b_start/8) AS BIGINT),
                                            CAST(floor(b_end/8) AS BIGINT) + 1))
                          AS bucket FROM b),
                 ca AS (SELECT bucket, count(*) AS n_left FROM la GROUP BY 1),
                 cb AS (SELECT bucket, count(*) AS n_right FROM lb GROUP BY 1),
                 cert AS (SELECT bucket, n_left, n_right,
                                 n_left * n_right > 64 AS culled
                          FROM ca JOIN cb USING (bucket)),
                 p AS (SELECT CAST(floor(greatest(a_start, b_start)/8)
                                   AS BIGINT) AS bucket
                       FROM a JOIN b
                         ON a_start <= b_end AND b_start <= a_end),
                 pk AS (SELECT bucket, count(*) AS n_pairs FROM p
                        WHERE bucket NOT IN
                          (SELECT bucket FROM cert WHERE culled)
                        GROUP BY 1)
            SELECT c.bucket, n_left, n_right, culled,
                   coalesce(n_pairs, 0) AS n_pairs
            FROM cert c LEFT JOIN pk USING (bucket) ORDER BY bucket"""))

  // ---------------------------------------------------------------- q29
  // RANGE-frame window (time-based moving aggregate): trailing-1-hour
  // count + sum per user. Both engines order by INTEGER microseconds
  // (Spark floors parquet nanos to µs; epoch_us mirrors that floor in the
  // oracle) so frame membership is bit-identical by construction — a
  // timestamp-typed RANGE frame would disagree on ns-boundary pairs.
  private val q29 = NamedQuery(
    "q29_range_frame",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600000000L, 0L)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("value"), col("ts"))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("sum_1h", r2(sum(col("value")).over(w)))
        .select(col("event_id"), col("user_id"), col("n_1h"), col("sum_1h"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, user_id,
                   count(*) OVER w AS n_1h,
                   round(sum(value) OVER w, 2) AS sum_1h
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
            ORDER BY event_id"""))

  // ---------------------------------------------------------------- q30
  // NTILE decile bucketing WITHIN partitions (per order status): equal-
  // count buckets with the remainder spread over the leading tiles — the
  // histogram/equi-depth binning idiom. Partitioned, so the sort shuffles
  // on o_orderstatus instead of collapsing to one task the way a global
  // NTILE would; the (price, key) order key makes tiles deterministic.
  private val q30 = NamedQuery(
    "q30_ntile_buckets",
    (s, d) => {
      // ntile(10) RESTATED as closed forms over the (status, cents)
      // frequency table (r12 — the q34/percentile discipline): the naive
      // window sorts each of THREE status partitions in one task (the
      // whole 5M-row partition at sf10 — measured 26s, 12.7×/decade).
      // Deciles are contiguous rank ranges, so the output needs only
      // (a) each decile's rank bounds — pure arithmetic from n, the
      // standard ntile split base = n DIV 10 with the remainder spread
      // over leading tiles; (b) the PRICE at each bound — a rank→value
      // lookup, i.e. the smallest cents whose cumulative frequency
      // reaches the rank (ties by orderkey can't change the cents at a
      // rank: identical multiset); (c) count = hi−lo+1, no data at all.
      // The cumulative sum runs through Quantiles.cumFreq — and since
      // o_totalprice is near-unique, the domain-cardinality gate trips
      // at sf1+ and this query becomes the range-partitioned prefix
      // sum's first production consumer.
      val o = Tables.orders(s, d).select(col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val freq = o.groupBy(col("o_orderstatus"), col("cents"))
        .agg(count(lit(1)).as("__c"))
      val cum = graft.operators.Quantiles.cumFreq(
        freq, Seq("o_orderstatus"), "cents", "__c")
      val n = cum.groupBy(col("o_orderstatus"))
        .agg(max(col("__cum")).as("__n"))
      val tiles = n
        .select(col("o_orderstatus"), col("__n"),
          explode(sequence(lit(1), lit(10))).as("decile"))
        .withColumn("__base", expr("__n DIV 10"))
        .withColumn("__rem", col("__n") % 10)
        .withColumn("__lo", when(col("decile") <= col("__rem"),
            (col("decile") - 1) * (col("__base") + 1) + 1)
          .otherwise(col("__rem") * (col("__base") + 1) +
            (col("decile") - col("__rem") - 1) * col("__base") + 1))
        .withColumn("__hi", when(col("decile") <= col("__rem"),
            col("__lo") + col("__base"))
          .otherwise(col("__lo") + col("__base") - 1))
        .filter(col("__hi") >= col("__lo")) // ntile emits no empty tile
      // ONE bracket pass: each (status, decile) needs the cents at its
      // two bound ranks; a cum row brackets rank r iff cum−c < r ≤ cum
      def brackets(bound: Column) =
        col("__cum") >= bound && col("__cum") - col("__c") < bound
      cum.join(broadcast(tiles), Seq("o_orderstatus"))
        .filter(brackets(col("__lo")) || brackets(col("__hi")))
        .groupBy(col("o_orderstatus"), col("decile"))
        .agg(first(col("__hi") - col("__lo") + 1).as("__n"),
          min(when(brackets(col("__lo")), col("cents"))).as("__locents"),
          min(when(brackets(col("__hi")), col("cents"))).as("__hicents"))
        .select(col("o_orderstatus"), col("decile"),
          col("__n").cast("long").as("n"),
          round(col("__locents") / 100.0, 2).as("min_price"),
          round(col("__hicents") / 100.0, 2).as("max_price"))
        .orderBy(col("o_orderstatus"), col("decile"))
    },
    Some("""WITH t AS (SELECT o_orderstatus, o_totalprice,
                              ntile(10) OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice, o_orderkey) AS decile
                       FROM orders)
            SELECT o_orderstatus, decile, count(*) AS n,
                   round(min(o_totalprice), 2) AS min_price,
                   round(max(o_totalprice), 2) AS max_price
            FROM t GROUP BY 1, 2 ORDER BY 1, 2"""))

  // ---------------------------------------------------------------- gold
  // Flagship: the reference's entire Gold pipeline re-expressed over the
  // events table (gold_batch_job.py:22-90 / SURVEY §3.2): latest reading
  // per station (W1 window dedup) → banded theta join against incidents
  // (J1+J2) → chained CASE risk classify (P6) → projection (P1).
  //
  // The band predicate |intensity − level| < 5 is planned as an EQUI join:
  // each station hashes to band floor(level/5); each incident probes its
  // own band ± 1 (any level within 5.0 of intensity must land in one of
  // those three bands, and each station matches at most one probe, so no
  // duplicate pairs). The exact predicate stays as the residual filter.
  // This is the value-axis analogue of GoldJob.goldAlertsGrid: no
  // nested-loop join anywhere, the small deduped side broadcasts via AQE
  // today, and at station cardinalities past the broadcast threshold the
  // same plan degrades to a sort-merge join on the band key instead of an
  // |incidents|×|stations| loop.
  private val gold = NamedQuery(
    "gold_alerts",
    (s, d) => {
      val ev = Tables.events(s, d).withColumn("ts_ms", unix_millis(col("ts")))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ms").desc, col("event_id").desc)
      val bandW = 5.0
      val stations = ev
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id").as("station_id"), col("value").as("level"),
                col("ts_ms").as("level_ts_ms"))
        .withColumn("band", floor(col("level") / bandW))
      val incidents = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("incident_id"), col("user_id"),
                col("value").as("intensity"), col("ts_ms"))
        .withColumn("band", explode(array(
          floor(col("intensity") / bandW) - 1,
          floor(col("intensity") / bandW),
          floor(col("intensity") / bandW) + 1)))
      incidents
        .join(stations, Seq("band"))
        .filter(abs(col("intensity") - col("level")) < 5.0)
        .withColumn("risk_level",
          when(col("intensity") >= 400.0 && col("level") >= 400.0, "EXTREME")
          .when(col("intensity") >= 400.0, "VERY_HIGH")
          .when(col("intensity") >= 250.0, "HIGH")
          .when(col("intensity") >= 100.0, "MODERATE")
          .otherwise("LOW"))
        .select(col("incident_id"), col("station_id"),
                r2(col("intensity")).as("intensity"), r2(col("level")).as("level"),
                round(abs(col("intensity") - col("level")), 4).as("distance"),
                col("risk_level"))
        .orderBy(col("incident_id"), col("station_id"))
    },
    Some("""WITH ev AS (SELECT *, epoch_ms(ts) AS ts_ms FROM events),
            stations AS (
              SELECT user_id AS station_id, value AS level
              FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                      ORDER BY ts_ms DESC, event_id DESC) AS rn FROM ev)
              WHERE rn = 1),
            incidents AS (
              SELECT event_id AS incident_id, user_id, value AS intensity
              FROM ev WHERE event_type = 'error')
            SELECT incident_id, station_id,
                   round(intensity,2) AS intensity, round(level,2) AS level,
                   round(abs(intensity - level),4) AS distance,
                   CASE WHEN intensity >= 400.0 AND level >= 400.0 THEN 'EXTREME'
                        WHEN intensity >= 400.0 THEN 'VERY_HIGH'
                        WHEN intensity >= 250.0 THEN 'HIGH'
                        WHEN intensity >= 100.0 THEN 'MODERATE'
                        ELSE 'LOW' END AS risk_level
            FROM incidents JOIN stations ON abs(intensity - level) < 5.0
            ORDER BY incident_id, station_id"""))

  // ------------------------------------------------------------- q32
  // GROUPING SETS — the general form rollup (q18) and cube (q19) are
  // special cases of: an explicit, non-lattice set list ((a,b),(a),(b),())
  // with per-column grouping() indicators. Catalyst plans ONE Expand over
  // the scan (4× row multiplication bounded by the set count, then a
  // single hash aggregate) — no union of four scans, which at 100 TB is
  // the difference between one pass and four. The oracle runs the same
  // ANSI GROUPING SETS in DuckDB; the grouping() indicator columns pin the
  // per-set provenance, so a missing set or a mislabeled subtotal row
  // breaks the hash.
  private val q32 = NamedQuery(
    "q32_grouping_sets",
    (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("q32_orders")
      s.sql("""SELECT o_orderstatus, o_orderpriority,
                      CAST(grouping(o_orderstatus) AS INT) AS g_status,
                      CAST(grouping(o_orderpriority) AS INT) AS g_prio,
                      count(*) AS n_orders,
                      round(sum(o_totalprice), 2) AS total_price
               FROM q32_orders
               GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                       (o_orderstatus), (o_orderpriority), ())
               ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority""")
    },
    Some("""SELECT o_orderstatus, o_orderpriority,
                   CAST(grouping(o_orderstatus) AS INT) AS g_status,
                   CAST(grouping(o_orderpriority) AS INT) AS g_prio,
                   count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS total_price
            FROM orders
            GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                    (o_orderstatus), (o_orderpriority), ())
            ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority"""))

  // ------------------------------------------------------------- q33
  // Correlated scalar subqueries — parts priced above their brand's
  // average. Catalyst decorrelates both subqueries into ONE per-brand
  // aggregate joined back to the scan (no per-row re-execution — the
  // naive nested-loop reading of the SQL would be O(rows × brands) scans
  // at 100 TB; `.explain` shows a single Aggregate + BroadcastHashJoin).
  // The mean comparison runs in EXACT integer cents (price·100 · n vs the
  // brand's cent sum) so the predicate cannot land on a double-summation
  // boundary that Spark and DuckDB round differently — the same
  // engine-stability discipline as q9.
  private val q33 = NamedQuery(
    "q33_scalar_subquery",
    (s, d) => {
      Tables.part(s, d).createOrReplaceTempView("q33_part")
      s.sql("""SELECT p_brand, count(*) AS n_above,
                      round(max(p_retailprice), 2) AS top_price
               FROM q33_part p
               WHERE CAST(round(p_retailprice * 100) AS BIGINT) *
                     (SELECT count(*) FROM q33_part p2
                      WHERE p2.p_brand = p.p_brand)
                     >
                     (SELECT sum(CAST(round(p2.p_retailprice * 100) AS BIGINT))
                      FROM q33_part p2 WHERE p2.p_brand = p.p_brand)
               GROUP BY p_brand ORDER BY p_brand""")
    },
    Some("""SELECT p_brand, count(*) AS n_above,
                   round(max(p_retailprice), 2) AS top_price
            FROM part p
            WHERE CAST(round(p_retailprice * 100) AS BIGINT) *
                  (SELECT count(*) FROM part p2
                   WHERE p2.p_brand = p.p_brand)
                  >
                  (SELECT CAST(sum(CAST(round(p2.p_retailprice * 100) AS BIGINT))
                               AS BIGINT)
                   FROM part p2 WHERE p2.p_brand = p.p_brand)
            GROUP BY p_brand ORDER BY p_brand"""))

  // ------------------------------------------------------------- q34
  // Distribution-rank window family — percent_rank / cume_dist / nth_value
  // / full-frame last — the remaining ANSI window functions past
  // rank/dense_rank (q4), lead/lag (q8), range frames (q29) and ntile
  // (q30). The ORDER BY carries the full (qty DESC, orderkey, linenumber)
  // tiebreak so every rank value is deterministic — percent_rank over a
  // tied prefix is engine-stable only when the sort is total.
  //
  // SCALE RESTATEMENT (r11). The naive form — all five functions in one
  // window, rn<=15 after — forces a FULL per-key sort, and the partition
  // key has 3 values: each rank family sorts ~n/3 rows in ONE task, the
  // one plan shape that cannot parallelize below key cardinality (honest
  // sf1 9.0s, sf10 75.2s, 8.3×/decade — all of it single-task sort). But
  // under a TOTAL order every full-partition function here is a closed
  // form of (rn, per-key aggregates):
  //   rank = rn             ⇒ percent_rank = (rn-1)/(N-1)   (0 when N=1)
  //   cume_dist = rn/N      (no ties by construction)
  //   full-frame last = the partition min of l_quantity
  //   full-frame nth_value(qty, 3) = the qty at rn=3 (null when N<3)
  // so the only window left is row_number itself, whose rn<=15 filter
  // Catalyst pushes BELOW the exchange as a map-side WindowGroupLimit
  // (each scan task ships its local top-15 per flag) — plan-pinned in
  // PlanQualitySpec. What remains: one map-side-combined agg for
  // (N, min_qty), one broadcast join back, arithmetic identical
  // bit-for-bit to the engines' own window internals (both compute the
  // same integer→double divisions). At 100 TB the cost is two pruned
  // column scans — no task ever sorts more than its local top-15.
  private val q34 = NamedQuery(
    "q34_rank_family",
    (s, d) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity").desc, col("l_orderkey"), col("l_linenumber"))
      val base = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
                col("l_quantity"))
      val stats = base.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"), min(col("l_quantity")).as("min_qty"))
      val top = base
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 15)
      val third = top.filter(col("rn") === 3)
        .select(col("l_returnflag"), col("l_quantity").as("third_qty"))
      top
        .join(broadcast(stats), Seq("l_returnflag"))
        .join(broadcast(third), Seq("l_returnflag"), "left")
        .withColumn("pr", round(
          when(col("n_rows") === 1, lit(0.0))
            .otherwise((col("rn") - 1).cast("double")
              / (col("n_rows") - 1).cast("double")), 6))
        .withColumn("cd", round(
          col("rn").cast("double") / col("n_rows").cast("double"), 6))
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
                col("l_quantity"), col("rn"), col("pr"), col("cd"),
                col("third_qty"), col("min_qty"))
        .orderBy(col("l_returnflag"), col("rn"))
    },
    Some("""WITH w AS (
              SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
                     row_number() OVER win AS rn,
                     round(percent_rank() OVER win, 6) AS pr,
                     round(cume_dist() OVER win, 6) AS cd,
                     nth_value(l_quantity, 3) OVER winf AS third_qty,
                     last_value(l_quantity) OVER winf AS min_qty
              FROM lineitem
              WINDOW win AS (PARTITION BY l_returnflag
                             ORDER BY l_quantity DESC, l_orderkey, l_linenumber),
                     winf AS (PARTITION BY l_returnflag
                              ORDER BY l_quantity DESC, l_orderkey, l_linenumber
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND UNBOUNDED FOLLOWING))
            SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
                   rn, pr, cd, third_qty, min_qty
            FROM w WHERE rn <= 15 ORDER BY l_returnflag, rn"""))

  // ------------------------------------------------------------- q35
  // Time-series gap fill — the dense hourly grid a dashboard or a
  // downstream ML featurizer needs, materialized from a SPARSE event
  // count: sequence() over the corpus [min,max] hour span, exploded to
  // one row per hour, left-joined with the real per-hour counts, absent
  // hours coalesced to 0. The grid is O(hours) — tiny and broadcast —
  // while the counts side is already reduced by the aggregate, so the
  // join never touches raw fact rows; at 100 TB the only full-scan cost
  // is the min/max bound pass (answered by parquet footer stats) and the
  // filtered count aggregate. Buckets ship as epoch millis so the hash
  // is timezone-representation-proof.
  private val q35 = NamedQuery(
    "q35_gapfill",
    (s, d) => {
      val ev = Tables.events(s, d)
      val grid = ev
        .agg(min(date_trunc("hour", col("ts"))).as("lo"),
             max(date_trunc("hour", col("ts"))).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
                                 expr("interval 1 hour"))).as("bucket"))
      val hot = ev
        .filter(col("event_type") === "purchase" && col("value") > 300.0)
        .groupBy(date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n_hot"))
      grid.join(hot, Seq("bucket"), "left")
        .select(unix_millis(col("bucket")).as("bucket_ms"),
                coalesce(col("n_hot"), lit(0L)).as("n_hot"))
        .orderBy(col("bucket_ms"))
    },
    Some("""WITH b AS (SELECT date_trunc('hour', min(ts)) AS lo,
                              date_trunc('hour', max(ts)) AS hi FROM events),
            g AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
                  FROM b),
            c AS (SELECT date_trunc('hour', ts) AS bucket, count(*) AS n_hot
                  FROM events WHERE event_type = 'purchase' AND value > 300.0
                  GROUP BY 1)
            SELECT epoch_ms(g.bucket) AS bucket_ms,
                   coalesce(c.n_hot, 0) AS n_hot
            FROM g LEFT JOIN c USING (bucket) ORDER BY 1"""))

  // ------------------------------------------------------------- q36
  // Linear interpolation of missing sensor readings — the time-series
  // repair primitive: rows whose value is unusable (here: the 'error'
  // events, the corpus's built-in missing-reading marker) get a value
  // linearly interpolated between the user's nearest valid readings on
  // either side, nearest-fill at the series edges. Both neighbors come
  // from ONE sort per user (two frames over the same window exchange):
  // last(non-null (ms,v) struct, ignoreNulls) over the preceding frame
  // and first(...) over the following frame — no self-join, no per-gap
  // subquery, state bounded by a row per frame. The interpolation
  // arithmetic is written identically in both engines (same double
  // expression tree), so round(,4) compares bit-stable; the equal-ms
  // guard keeps a zero-width gap from dividing by zero.
  private val q36 = NamedQuery(
    "q36_interpolate",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
                col("value"), unix_millis(col("ts")).as("ms"))
      val obs = when(col("event_type") =!= "error",
        struct(col("ms").as("oms"), col("value").as("v")))
      val ord = Seq(col("ms"), col("event_id"))
      val wb = Window.partitionBy(col("user_id")).orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wa = Window.partitionBy(col("user_id")).orderBy(ord: _*)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      ev.withColumn("p", last(obs, ignoreNulls = true).over(wb))
        .withColumn("nx", first(obs, ignoreNulls = true).over(wa))
        .filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"),
          round(
            when(col("p").isNotNull && col("nx").isNotNull,
              when(col("nx.oms") === col("p.oms"),
                   (col("p.v") + col("nx.v")) / lit(2.0))
              .otherwise(col("p.v") + (col("nx.v") - col("p.v")) *
                ((col("ms") - col("p.oms")).cast("double") /
                 (col("nx.oms") - col("p.oms")).cast("double"))))
            .when(col("p").isNotNull, col("p.v"))
            .when(col("nx").isNotNull, col("nx.v")),
            4).as("interp_value"))
        .orderBy(col("event_id"))
    },
    Some("""WITH u AS (SELECT user_id, event_id, event_type, value,
                              epoch_ms(ts) AS ms FROM events),
            w AS (
              SELECT *,
                last_value(CASE WHEN event_type <> 'error'
                                THEN struct_pack(oms := ms, v := value) END
                           IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY ms, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
                first_value(CASE WHEN event_type <> 'error'
                                 THEN struct_pack(oms := ms, v := value) END
                            IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY ms, event_id
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nx
              FROM u)
            SELECT event_id, user_id,
                   round(CASE
                     WHEN p IS NOT NULL AND nx IS NOT NULL THEN
                       CASE WHEN nx.oms = p.oms THEN (p.v + nx.v) / 2.0
                            ELSE p.v + (nx.v - p.v) *
                                 (CAST(ms - p.oms AS DOUBLE) /
                                  CAST(nx.oms - p.oms AS DOUBLE)) END
                     WHEN p IS NOT NULL THEN p.v
                     WHEN nx IS NOT NULL THEN nx.v END, 4) AS interp_value
            FROM w WHERE event_type = 'error' ORDER BY event_id"""))

  // ------------------------------------------------------------- q37
  // As-of join with tolerance, both directions — the full production
  // as-of surface past q26's plain backward form: for every purchase,
  // the user's nearest click STRICTLY BEFORE and STRICTLY AFTER, each
  // admitted only within a 2h tolerance (outside → null, row kept).
  // The tolerance post-filter is exact BECAUSE the window picks the
  // nearest neighbor: if the closest prior click misses the tolerance,
  // every older one does too, so filtering the single window result
  // equals filtering the whole set. Both directions ride ONE sort per
  // user (running max-struct over the preceding frame, min-struct over
  // the following frame — two frames, one window exchange, no
  // self-join), q26's shuffle-once as-of pattern doubled.
  private val q37 = NamedQuery(
    "q37_asof_tolerance",
    (s, d) => {
      val tolMs = 7200000L
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("user_id"), col("event_id"), col("event_type"),
                unix_millis(col("ts")).as("ms"))
      val clickStruct = when(col("event_type") === "click",
        struct(col("ms").as("cms"), col("event_id").as("cid")))
      val ord = Seq(col("ms"), col("event_id"))
      val wb = Window.partitionBy(col("user_id")).orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wa = Window.partitionBy(col("user_id")).orderBy(ord: _*)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      ev.withColumn("bk", max(clickStruct).over(wb))
        .withColumn("fw", min(clickStruct).over(wa))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          when(col("bk").isNotNull && col("ms") - col("bk.cms") <= tolMs,
               col("bk.cid")).as("back_click_id"),
          when(col("bk").isNotNull && col("ms") - col("bk.cms") <= tolMs,
               col("ms") - col("bk.cms")).as("back_gap_ms"),
          when(col("fw").isNotNull && col("fw.cms") - col("ms") <= tolMs,
               col("fw.cid")).as("fwd_click_id"),
          when(col("fw").isNotNull && col("fw.cms") - col("ms") <= tolMs,
               col("fw.cms") - col("ms")).as("fwd_gap_ms"))
        .orderBy(col("event_id"))
    },
    Some("""WITH u AS (
              SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms
              FROM events WHERE event_type IN ('click','purchase')),
            w AS (
              SELECT *,
                max(CASE WHEN event_type='click'
                         THEN struct_pack(cms := ms, cid := event_id) END)
                  OVER (PARTITION BY user_id ORDER BY ms, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bk,
                min(CASE WHEN event_type='click'
                         THEN struct_pack(cms := ms, cid := event_id) END)
                  OVER (PARTITION BY user_id ORDER BY ms, event_id
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fw
              FROM u)
            SELECT event_id, user_id,
                   CASE WHEN bk IS NOT NULL AND ms - bk.cms <= 7200000
                        THEN bk.cid END AS back_click_id,
                   CASE WHEN bk IS NOT NULL AND ms - bk.cms <= 7200000
                        THEN ms - bk.cms END AS back_gap_ms,
                   CASE WHEN fw IS NOT NULL AND fw.cms - ms <= 7200000
                        THEN fw.cid END AS fwd_click_id,
                   CASE WHEN fw IS NOT NULL AND fw.cms - ms <= 7200000
                        THEN fw.cms - ms END AS fwd_gap_ms
            FROM w WHERE event_type = 'purchase' ORDER BY event_id"""))

  // ------------------------------------------------- join_runtime_filter
  // Explicit runtime semi-join reduction — the star-join optimization
  // Spark's adaptive bloom runtime filter applies automatically, built
  // here from the engine's own sketch machinery so the plan is explicit
  // and auditable: the filtered dim's join keys are folded into a Bloom
  // filter (a driver-side sketch aggregate, ~1.2 MB at 1M keys / 1% fpp
  // — bounded by the SKETCH size, never the table), and the fact scan is
  // pre-filtered with `bloom_might_contain_long` BEFORE the shuffle. At
  // 100 TB the exchange then carries only ~priority-fraction of lineitem
  // (+1% false positives) instead of all of it; the exact equi join on
  // top removes the false positives, so the result is IDENTICAL to the
  // plain join — which is exactly what the oracle checks (its SQL has no
  // bloom at all).
  private val joinRuntimeFilter = NamedQuery(
    "join_runtime_filter",
    (s, d) => {
      graft.plans.GraftFunctions.ensure(s)
      val dim = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val nKeys = dim.count()
      val bloom = dim.stat.bloomFilter("o_orderkey", math.max(nKeys, 1L), 0.01)
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      val bytes = bos.toByteArray
      Tables.lineitem(s, d)
        .filter(graft.plans.GraftColumns.bloomMightContainLong(
          lit(bytes), col("l_orderkey")))
        .join(dim.withColumnRenamed("o_orderkey", "l_orderkey"),
              Seq("l_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
             r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
               .as("revenue"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l.l_returnflag, count(*) AS n,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
                     AS revenue
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderpriority = '1-URGENT'
            GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------- q38
  // Array higher-order functions — transform / filter / aggregate run
  // INSIDE the row (zero shuffle, whole-stage codegen), the idiom that
  // replaces explode→groupBy round trips for per-row array math. All
  // outputs are exact integers; the oracle mirrors with DuckDB's list_*
  // lambdas over the identical token arrays.
  private val q38 = NamedQuery(
    "q38_array_hof",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          graft.functions.TextFunctions.tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("lang"),
          size(col("toks")).cast("long").as("n_tokens"),
          size(expr("filter(toks, x -> length(x) > 4)")).cast("long")
            .as("n_long"),
          expr("aggregate(transform(toks, x -> CAST(length(x) AS BIGINT)), " +
            "0L, (a, b) -> a + b)").as("total_chars"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("tokens"),
          sum(col("n_long")).as("long_tokens"),
          sum(col("total_chars")).as("chars"))
        .orderBy(col("lang")),
    Some(s"""WITH t AS (SELECT doc_id, lang, string_split($normSql, ' ') AS l
                        FROM documents),
             p AS (SELECT doc_id, lang,
                          CAST(len(l) AS BIGINT) AS n_tokens,
                          CAST(len(list_filter(l, x -> len(x) > 4)) AS BIGINT)
                            AS n_long,
                          list_reduce(
                            list_prepend(CAST(0 AS BIGINT),
                              list_transform(l, x -> CAST(len(x) AS BIGINT))),
                            (a, b) -> a + b) AS total_chars
                   FROM t)
             SELECT lang, count(*) AS n_docs,
                    CAST(sum(n_tokens) AS BIGINT) AS tokens,
                    CAST(sum(n_long) AS BIGINT) AS long_tokens,
                    CAST(sum(total_chars) AS BIGINT) AS chars
             FROM p GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------- q39
  // Regex extraction surface: regexp_extract_all + regexp_count-style
  // stats per language. The pattern sticks to the RE2 ∩ java.util.regex
  // common dialect (\b word boundaries, character classes) so both
  // engines see identical matches.
  private val q39 = NamedQuery(
    "q39_regex_extract",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("lang"),
          size(expr("regexp_extract_all(text, '\\\\bs[a-z]+', 0)"))
            .cast("long").as("n_s_words"),
          regexp_extract(col("text"), "\\b(s[a-z]+)\\b", 1).as("first_s"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_s_words")).as("s_words"),
          count(when(col("n_s_words") > 0, 1)).as("docs_with_s"),
          min(when(col("first_s") =!= "", col("first_s"))).as("min_first_s"))
        .orderBy(col("lang")),
    Some("""WITH p AS (SELECT lang,
                              CAST(len(regexp_extract_all(text, '\bs[a-z]+'))
                                AS BIGINT) AS n_s_words,
                              regexp_extract(text, '\b(s[a-z]+)\b', 1)
                                AS first_s
                       FROM documents)
            SELECT lang, count(*) AS n_docs,
                   CAST(sum(n_s_words) AS BIGINT) AS s_words,
                   count(CASE WHEN n_s_words > 0 THEN 1 END) AS docs_with_s,
                   min(CASE WHEN first_s <> '' THEN first_s END)
                     AS min_first_s
            FROM p GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------- q40
  // Calendar/datetime surface on UTC-pinned epoch arithmetic: ISO week
  // truncation, month bucketing, and day-of-week — all derived from
  // epoch-day integers (ms/86400000; day 0 = Thursday), so no engine
  // calendar library or timezone rule is ever consulted and parity is
  // arithmetic, not configurational.
  private val q40 = NamedQuery(
    "q40_datetime_family",
    (s, d) =>
      Tables.events(s, d)
        .select(expr("CAST(floor(unix_millis(ts) / 86400000.0) AS BIGINT)")
          .as("day"))
        // ISO-ish week id: days since the Monday of epoch week 0
        // (epoch day 0 = Thu → shift +3 puts Monday at week boundaries)
        .select(col("day"),
          expr("(day + 3) DIV 7").as("week"),
          expr("(day + 4) % 7").as("dow"), // 0=Sunday … 6=Saturday
          expr("day DIV 30").as("month30"))
        .groupBy(col("week"), col("dow"), col("month30"))
        .agg(count(lit(1)).as("n"), min(col("day")).as("first_day"),
          max(col("day")).as("last_day"))
        .orderBy(col("week"), col("dow"), col("month30")),
    Some("""WITH e AS (SELECT CAST(floor(epoch_ms(ts) / 86400000.0)
                                AS BIGINT) AS day
                       FROM events)
            SELECT (day + 3) // 7 AS week, (day + 4) % 7 AS dow,
                   day // 30 AS month30,
                   count(*) AS n, min(day) AS first_day,
                   max(day) AS last_day
            FROM e GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""))

  // ---------------------------------------------------------------- q41
  // Null-semantics surface: null-safe equality (<=> / IS NOT DISTINCT
  // FROM), three-valued-logic filters, coalesce/nullif. The probe column
  // nullifies one value so every construct exercises a real null.
  private val q41 = NamedQuery(
    "q41_null_semantics",
    (s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"),
          nullif(col("o_orderpriority"), lit("3-MEDIUM")).as("pr"))
      val a = o.select(col("o_orderkey").as("k"), col("pr").as("pa"))
      val b = o.select((col("o_orderkey") + 1).as("k"), col("pr").as("pb"))
      a.join(b, Seq("k"))
        .agg(count(lit(1)).as("n_pairs"),
          count(when(col("pa") <=> col("pb"), 1)).as("nullsafe_eq"),
          count(when(col("pa") === col("pb"), 1)).as("plain_eq"),
          count(when(col("pa").isNull && col("pb").isNull, 1))
            .as("both_null"),
          count(when(coalesce(col("pa"), lit("none")) === "none", 1))
            .as("a_null"))
    },
    Some("""WITH o AS (SELECT o_orderkey,
                              nullif(o_orderpriority, '3-MEDIUM') AS pr
                       FROM orders),
            a AS (SELECT o_orderkey AS k, pr AS pa FROM o),
            b AS (SELECT o_orderkey + 1 AS k, pr AS pb FROM o)
            SELECT count(*) AS n_pairs,
                   count(CASE WHEN pa IS NOT DISTINCT FROM pb THEN 1 END)
                     AS nullsafe_eq,
                   count(CASE WHEN pa = pb THEN 1 END) AS plain_eq,
                   count(CASE WHEN pa IS NULL AND pb IS NULL THEN 1 END)
                     AS both_null,
                   count(CASE WHEN coalesce(pa, 'none') = 'none' THEN 1 END)
                     AS a_null
            FROM a JOIN b USING (k)"""))

  val all: Seq[NamedQuery] = Seq(
    q1, q2, q3, q4, q5, q6, q7, q8, q9, q10, q11, q12, q13, q14, q15, q16,
    q17, q18, q19, q20, q21, q22, q23, q24, q25, q26, q27, q28, q28capped,
    q29, q30,
    q31, q32, q33, q34, q35, q36, q37, q38, q39, q40, q41,
    joinRuntimeFilter, gold)
}
