package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix-scan (cumulative aggregation over a GLOBAL order).
  *
  * The naive formulation — `sum(x).over(Window.orderBy(key))` with no
  * partitionBy — collapses the whole table into ONE task, which is the
  * single worst scaling trap in Spark window usage. This operator runs the
  * textbook two-phase scan instead:
  *
  *   1. bucket rows by equi-depth split points of the order key (one narrow
  *      single-column aggregate computes the bounds; the bucket id is then a
  *      PURE expression of the row) and cumsum WITHIN each bucket — a
  *      window partitioned by the bucket id, fully parallel;
  *   2. aggregate one row per bucket (its total), prefix-sum that tiny
  *      table (p rows ≈ thousands at most — driver-scale by construction),
  *      and broadcast the per-bucket offsets back.
  *
  * Because the bucket id is deterministic per row (not derived from a
  * sampled exchange via `spark_partition_id`), the two consumers of the
  * bucketed frame agree under ANY re-execution — no `localCheckpoint` / no
  * pinned blocks, so the operator adds zero storage footprint at 100 TB
  * (the earlier checkpoint-based variant transiently doubled it). Net
  * cost: one extra column-pruned scan for the bounds + one hash exchange +
  * one broadcast — same result as the single-task window at any scale.
  */
object Scan {

  /** Adds `outCol` = sum of `value` over all rows with order key <= this
    * row's (inclusive running total in `order` order). `order` must be
    * unique (ties would make "global order" ill-defined) and of a type
    * `percentile_approx` accepts (numeric / date / timestamp).
    *
    * Cost contract, stated honestly: constructing the result runs the
    * bounds aggregation EAGERLY (one pass, pruned to the order column),
    * and the returned plan evaluates the INPUT twice more (window branch +
    * bucket-totals branch — their exchanges differ, so Spark cannot reuse
    * one). That is the deliberate trade against the previous
    * localCheckpoint design, which evaluated once but pinned the whole
    * input in block storage (cache pressure + 2× transient footprint at
    * scale). Callers whose upstream is an expensive derived pipeline
    * should `persist()` it themselves before calling — the operator no
    * longer decides that for them. Corollary: the input must be
    * DETERMINISTIC (no rand()/uuid() upstream without a persist) — the
    * two branches would otherwise observe different draws and the offsets
    * would not correspond to the windowed values.
    */
  def cumulativeSum(df: DataFrame, order: Column, value: Column,
      outCol: String): DataFrame = {
    import org.apache.spark.sql.types._
    // fail up front, not inside percentile_approx's analyzer error: the
    // bounds sketch only accepts numeric/date/timestamp keys. Merely
    // orderable keys (string etc.) that the old repartitionByRange design
    // tolerated need a sortable numeric surrogate from the caller.
    val keyType = df.select(order).schema.head.dataType
    val sketchable = keyType match {
      case _: NumericType | DateType | TimestampType | TimestampNTZType => true
      case _ => false
    }
    require(sketchable,
      s"cumulativeSum order key must be numeric, date, or timestamp " +
        s"(percentile-sketchable); got ${keyType.simpleString} — derive a " +
        "numeric surrogate (e.g. xxhash64 breaks global order; use a " +
        "monotone encoding of the key instead) and order by that")
    val isFloating = keyType == DoubleType || keyType == FloatType
    val parts = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    // 4 buckets per shuffle partition: the window exchange hashes BUCKET
    // ids into partitions, and with buckets == partitions balls-in-bins
    // leaves some tasks carrying 2-3 buckets and others none. Over-
    // decomposing 4× smooths the max task load; the offsets table is
    // still only `buckets` rows. Capped so the percentile sketch and (for
    // temporal keys) the fallback when-chain stay bounded — past the cap,
    // load smoothing saturates anyway.
    val buckets = math.min(parts * 4, 4096)
    // Pass 1: buckets-1 equi-depth split points of the order key.
    // Mergeable sketch → partial aggregation; the scan reads one column.
    // Approximate bounds only skew bucket SIZES, never correctness —
    // assignment below is monotone in `order` regardless of where the
    // bounds fall.
    val probs = (1 until buckets).map(_.toDouble / buckets)
    val bounds: Seq[Any] =
      if (probs.isEmpty) Seq.empty
      else {
        val row = df
          .agg(percentile_approx(order, array(probs.map(lit): _*), lit(10000))
            .as("b"))
          .head()
        if (row.isNullAt(0)) Seq.empty else row.getSeq[Any](0)
      }
    // bucket id = #bounds strictly below this key — deterministic, monotone
    // non-decreasing in `order`, so each bucket holds a contiguous range.
    // Numeric keys go through the binary-search kernel (O(log buckets) per
    // row, single expression node); a when-chain here would be O(buckets)
    // deep — analyzer stack overflow territory at real shuffle-partition
    // counts. Temporal keys (rare) keep the fold, with depth bounded by
    // the bucket cap. The double cast is monotone, so bucket CONTENTS stay
    // contiguous either way; only sizes could shift at cast ties.
    graft.plans.GraftFunctions.ensure(df.sparkSession)
    // coalesce: a null order key (outside the uniqueness contract, but it
    // must not SILENTLY drop the row through the null-never-equal join)
    // lands in bucket 0, same as the when-chain path evaluates it.
    val rawPid: Column =
      if (bounds.isEmpty) lit(0)
      else if (bounds.forall(_.isInstanceOf[Number]))
        graft.plans.GraftColumns.bucketBySortedBounds(order.cast("double"),
          bounds.map(_.asInstanceOf[Number].doubleValue).toArray)
      else bounds.foldLeft(lit(0)) { (acc, b) =>
        acc + when(order > lit(b), 1).otherwise(0)
      }
    // NaN keys: every binary-search comparison is false, which would file
    // them in bucket 0 — but Spark's sort order places NaN LAST (greater
    // than any double), so the window inside bucket 0 would accumulate
    // them at its end while the global offsets assume they sit before
    // bound(0): wrong running totals. Route NaN to the last bucket, where
    // bucket-local sort order and global bucket order agree again.
    val pid: Column = coalesce(
      if (isFloating) when(isnan(order), lit(buckets - 1)).otherwise(rawPid)
      else rawPid,
      lit(0))
    // no explicit repartition: the window's own hash exchange on __pid
    // distributes the data, and the offsets aggregation map-side combines
    // to <= buckets rows per task before its (tiny) exchange
    val parted = df.withColumn("__pid", pid)
    val local = parted.withColumn("__cum_local",
      sum(value).over(Window.partitionBy(col("__pid")).orderBy(order)))
    val offsets = parted.groupBy(col("__pid"))
      .agg(sum(value).as("__ptotal"))
      .withColumn("__offset",
        coalesce(sum(col("__ptotal")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0)))
      .select(col("__pid"), col("__offset"))
    local.join(broadcast(offsets), "__pid")
      .withColumn(outCol, col("__cum_local") + col("__offset"))
      .drop("__pid", "__cum_local")
  }
}
