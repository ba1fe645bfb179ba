package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Leakage-safe dataset splitting. A plain row-wise train/holdout split
  * leaks whenever two near-duplicate documents land on opposite sides of
  * the cut — the model "sees" the holdout via its twin. The fix: split by
  * DUPLICATE CLUSTER, not by row. Every doc inherits its connected-
  * component representative as the split key (singletons key on
  * themselves), so a whole near-dup cluster always lands in one split.
  *
  * Scale: Clusters.connectedComponents shuffles on the pair graph (tiny
  * relative to the corpus — only docs that appear in some pair); the final
  * assignment is a left join corpus × components, broadcastable whenever
  * the dup-pair population is small, plus a narrow md5 filter.
  */
object Splits {

  /** (doc_id, group_key, split) with split ∈ {holdout, train}, holdout
    * chosen at ~`holdoutFraction` of GROUPS by md5(group_key).
    */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame,
      holdoutFraction: Double, idCol: String = "doc_id",
      aCol: String = "doc1", bCol: String = "doc2"): DataFrame = {
    val cc = Clusters.connectedComponents(pairs, aCol, bCol)
      .select(col("node").as(idCol), col("cluster_id"))
    docs.select(col(idCol))
      .join(cc, Seq(idCol), "left")
      .withColumn("group_key", coalesce(col("cluster_id"), col(idCol)))
      .withColumn("split",
        when(Sampling.md5Prefix6(col("group_key")) <
          lit(Sampling.hexCut(holdoutFraction)), lit("holdout"))
          .otherwise(lit("train")))
      .select(col(idCol), col("group_key"), col("split"))
  }
}
