package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout optimization for multi-dimensional range queries —
  * Z-ORDER (Morton-curve) clustering, the Delta/Iceberg `OPTIMIZE ZORDER
  * BY` capability: interleave the bits of the dimension columns so rows
  * close in BOTH dimensions land in the same files, and parquet row-group
  * min/max stats prune scans on either predicate.
  *
  * `zvalue` is a pure codegen fold over bit positions (no UDF); `zorderBy`
  * range-partitions + locally sorts on it, which is exactly the write-side
  * shuffle a clustered rewrite pays anyway. Dimensions are min-max scaled
  * to [0, 2^bits) from one tiny 4-number aggregate broadcast back — no
  * global rank window (a rank/ntile normalization would funnel the whole
  * table through one partition). Heavily skewed dimensions can swap in an
  * approx-quantile equi-depth mapping at the same broadcast shape.
  */
object Layout {

  /** Morton interleave of two pre-normalized integer columns in
    * [0, 2^bits): bit i of `x` → bit 2i, bit i of `y` → bit 2i+1.
    */
  def zvalue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(x.cast("long").bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(y.cast("long").bitwiseAND(lit(1L << i)), i + 1))
    }
  }

  /** Rewrite `df` clustered on the Morton curve of (`xCol`, `yCol`) into
    * `numFiles` range partitions, each locally sorted by z-value — the
    * layout to hand `TableCatalog.overwrite` so both-dimension range
    * predicates prune at the row-group level.
    */
  def zorderBy(df: DataFrame, xCol: Column, yCol: Column,
      numFiles: Int, bits: Int = 16): DataFrame = {
    require(numFiles >= 1)
    val bounds = df.agg(
      min(xCol.cast("double")).as("__xlo"), max(xCol.cast("double")).as("__xhi"),
      min(yCol.cast("double")).as("__ylo"), max(yCol.cast("double")).as("__yhi"))
    val top = (1L << bits) - 1
    def scale(c: Column, lo: Column, hi: Column): Column =
      when(hi === lo, lit(0L)).otherwise(
        floor((c.cast("double") - lo) / (hi - lo) * top).cast("long"))
    val z = zvalue(
      scale(xCol, col("__xlo"), col("__xhi")),
      scale(yCol, col("__ylo"), col("__yhi")), bits)
    df.crossJoin(broadcast(bounds))
      .withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z", "__xlo", "__xhi", "__ylo", "__yhi")
  }
}
