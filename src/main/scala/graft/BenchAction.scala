package graft

import org.apache.spark.sql.DataFrame

/** The ONE action every timing harness (Bench, TimeOne) drives a query
  * with. It must be structurally non-prunable: the r8 bench drove queries
  * with `.count()`, and Catalyst's RemoveRedundantAggregates + column
  * pruning silently DROPPED whole computations whose values didn't feed
  * the count (`approx_distinct_hll` read 0.20s for two rounds while its
  * real cost was ~4s — BASELINE.md "Bench-pruning artifact"). Fixing the
  * affected queries one by one left the bug class open for every future
  * declarative query; this consumer closes it at the harness.
  *
  * A `noop`-format batch write (Spark's built-in benchmarking sink,
  * `org.apache.spark.sql.execution.datasources.noop`) is the right action
  * because a write REQUIRES the full output schema: every output column
  * of every row must be computed and delivered to the sink, so no
  * optimizer rule may prune a column or collapse an aggregate above the
  * scan — while the sink itself discards rows at zero per-row cost, so
  * the measurement stays on the query, not on serialization or disk.
  * This is also what a production run does (materialize all rows), making
  * bench numbers comparable to the Verify/parquet cost for the first time.
  *
  * BenchActionSpec pins both halves: a known-prunable shape KEEPS its
  * aggregate under this consumer, and the same shape LOSES it under
  * `.count()` (documenting why count is banned in timing paths).
  */
object BenchAction {
  def consume(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
}
