package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance from a catalog change feed —
  * the reason a lakehouse records CDC at all: a gold aggregate is kept
  * current by applying the (small) delta between two snapshot versions
  * instead of recomputing over the full table.
  *
  * Scale: the delta aggregates over the CHANGE FEED (rows proportional to
  * what changed), shuffling once on the group key; the stored gold side
  * joins on the same key. At 100 TB with a 0.1% daily churn this turns a
  * full-table scan-and-shuffle into work 1000× smaller — the
  * `foreachBatch`-refresh topology (`SilverJob.startGoldRefresh`) with the
  * recompute swapped for this delta apply.
  */
object Incremental {

  /** Apply a `TableCatalog.changesByKey` feed to a (count, sum)-shaped
    * aggregate: inserts and update postimages contribute +1/+value,
    * deletes and update preimages −1/−value — so an update nets to its
    * value difference and the result provably equals the full recompute
    * over the new snapshot (count and sum are the self-maintainable
    * aggregates; avg/min/max derive or need auxiliary state). Groups whose
    * count reaches zero are dropped, matching what a recompute never sees.
    */
  def applyCountSumDelta(gold: DataFrame, changes: DataFrame,
      groupCols: Seq[String], nCol: String, sumCol: String,
      valueCol: String): DataFrame = {
    val sgn = when(col("_change_type").isin("insert", "update_postimage"),
      lit(1L)).otherwise(lit(-1L))
    val delta = changes
      .groupBy(groupCols.map(col): _*)
      .agg(sum(sgn).as("__dn"),
           sum(sgn.cast("double") * col(valueCol)).as("__dsum"))
    gold.join(delta, groupCols, "full_outer")
      .select(groupCols.map(col) ++ Seq(
        (coalesce(col(nCol), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as(nCol),
        (coalesce(col(sumCol), lit(0.0)) + coalesce(col("__dsum"), lit(0.0)))
          .as(sumCol)): _*)
      .filter(col(nCol) > 0)
  }
}
