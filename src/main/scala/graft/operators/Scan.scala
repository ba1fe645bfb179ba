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
  *   1. range-partition by the order key (so partition i holds keys all
  *      below partition i+1) and cumsum WITHIN each partition — a window
  *      partitioned by `spark_partition_id()`, fully parallel;
  *   2. aggregate one row per partition (its total), prefix-sum that tiny
  *      table (p rows ≈ thousands at most — driver-scale by construction),
  *      and broadcast the per-partition offsets back.
  *
  * Net cost: one range exchange + one broadcast — same result as the
  * single-task window at any scale.
  */
object Scan {

  /** Adds `outCol` = sum of `value` over all rows with order key <= this
    * row's (inclusive running total in `order` order). `order` must be
    * unique (ties would make "global order" ill-defined).
    */
  def cumulativeSum(df: DataFrame, order: Column, value: Column,
      outCol: String): DataFrame = {
    val parts = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    // localCheckpoint freezes the (sampled) range boundaries so the two
    // consumers below see identical partitioning
    val parted = df
      .repartitionByRange(parts, order)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = false)
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
