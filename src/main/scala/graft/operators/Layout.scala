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
    *
    * Implemented as the magic-mask bit spread (5 shift-AND steps per
    * dimension), not a per-bit fold: the fold's 2×`bits` terms each embed
    * the full input expression, and a non-trivial input (zorderBy's
    * min-max scale) blows the projection past codegen's method limits —
    * interpreted eval made a 600k-row rewrite ~15× slower. The spread is
    * a linear chain of ~12 cheap ops regardless of `bits`, identical
    * output for any input < 2^bits.
    */
  def zvalue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    def spread(c: Column): Column = {
      val masked = c.cast("long").bitwiseAND(lit((1L << bits) - 1))
      Seq(16 -> 0x0000FFFF0000FFFFL, 8 -> 0x00FF00FF00FF00FFL,
        4 -> 0x0F0F0F0F0F0F0F0FL, 2 -> 0x3333333333333333L,
        1 -> 0x5555555555555555L)
        .foldLeft(masked) { case (v, (sh, mask)) =>
          v.bitwiseOR(shiftleft(v, sh)).bitwiseAND(lit(mask))
        }
    }
    spread(x).bitwiseOR(shiftleft(spread(y), 1))
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
    // scaled dims land in their own projection so the interleave references
    // plain attributes — CollapseProject keeps non-cheap aliases that are
    // referenced more than once, so the div/floor runs once per row
    df.crossJoin(broadcast(bounds))
      .withColumn("__zx", scale(xCol, col("__xlo"), col("__xhi")))
      .withColumn("__zy", scale(yCol, col("__ylo"), col("__yhi")))
      .withColumn("__z", zvalue(col("__zx"), col("__zy"), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z", "__zx", "__zy", "__xlo", "__xhi", "__ylo", "__yhi")
  }
}
