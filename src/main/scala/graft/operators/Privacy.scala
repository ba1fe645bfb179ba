package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity-style privacy gate for training data: keep only rows whose
  * grouping key (user, session, account) occurs at least `k` times — rows
  * from rare keys are the re-identifiable ones. The inverse (`keep =
  * false`) extracts the suppressed slice for audit.
  *
  * Scale: one partial-aggregated count on the key plus a key-local join
  * back. Rows of qualifying keys never leave their partitions when the
  * count side is broadcast-small; otherwise it's a plain equi shuffle on
  * the same key as the aggregation (exchange reuse).
  */
object Privacy {

  def kAnonymous(df: DataFrame, key: Column, k: Long,
      keep: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = df.groupBy(key.as("__k")).agg(count(lit(1)).as("__n"))
    val qualifying = counts.filter(
      if (keep) col("__n") >= k else col("__n") < k).select(col("__k"))
    // null-safe equality: NULL is a real key (groupBy counts it as one
    // group); a plain === would silently drop null-key rows from BOTH
    // slices and break the keep/suppress partition contract
    df.join(qualifying, key <=> col("__k"), "left_semi")
  }
}
