package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. `df.sample()` is
  * seed-dependent per partition-split and irreproducible across engines and
  * re-runs with different partitioning; these operators derive the sampling
  * decision from a content hash (md5 of the key), so the same row set is
  * selected on any cluster layout, any engine, any day — which is what a
  * data pipeline needs for auditable held-out splits.
  *
  * Scale: hashBernoulli is a pure narrow filter (no shuffle, pushes down
  * nothing but costs one md5 per row); stratifiedQuota shuffles once on the
  * stratum key — partial top-n per stratum would need a custom aggregate,
  * but quotas are small so the window + filter plan (rank prunes early
  * under WholeStageCodegen) holds fine.
  */
object Sampling {

  /** md5-prefix as a uniform value in [0, 16^6): the first 6 hex chars of
    * md5(key) compared lexicographically against the fraction cut. String
    * comparison of fixed-width lowercase hex == numeric comparison, and
    * md5 is bit-identical everywhere. fraction = 1.0 maps to "g" — above
    * every hex string — so a 100% sample is exactly the identity (clamping
    * to ffffff would silently drop the 1-in-2^24 keys hashing to it).
    */
  private[operators] def hexCut(fraction: Double): String = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of range: $fraction")
    if (fraction >= 1.0) "g"
    else f"${math.floor(fraction * (1L << 24)).toLong}%06x"
  }

  /** First 6 hex chars of md5(key) — the shared uniform-value primitive. */
  private[operators] def md5Prefix6(key: Column): Column =
    substring(md5(key.cast("string")), 1, 6)

  /** Keep ~`fraction` of rows, chosen by md5(key) prefix — deterministic,
    * partition-layout-independent Bernoulli sampling.
    */
  def hashBernoulli(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.filter(md5Prefix6(key) < lit(hexCut(fraction)))

  /** Exactly min(n, |stratum|) rows per stratum, chosen and ordered by
    * md5(key) — a deterministic stratified quota sample (equal-allocation).
    * Key ties broken by the key itself so the pick is total-ordered.
    */
  def stratifiedQuota(df: DataFrame, stratum: Column, key: Column,
      n: Int): DataFrame = {
    val w = Window.partitionBy(stratum)
      .orderBy(md5(key.cast("string")), key)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Deterministic weighted sampling without replacement (Efraimidis-
    * Spirakis A-Res): priority = u^(1/w) with u a reproducible uniform
    * derived from md5(key) (polynomial-hash of the hex digest over the
    * 1e9+7 field — mirrorable in any SQL engine), keep the k highest.
    * Heavier rows win proportionally more often; same k rows on any
    * partition layout. The top-k runs as TakeOrderedAndProject
    * (distributed partial top-k per partition), NOT a global sort; the
    * rank window then orders only the k survivors.
    */
  def weightedTopK(df: DataFrame, key: Column, weight: Column,
      k: Int): DataFrame = {
    graft.plans.GraftFunctions.ensure(df.sparkSession)
    val u = graft.plans.GraftColumns.md5PolyHash(key)
      .cast("double") / lit(1000000007.0)
    val pri = pow(u, lit(1.0) / weight.cast("double"))
    // order on the 8-decimal-rounded priority (stable against last-ulp pow
    // differences between engines), key as total-order tiebreak
    val scored = df.withColumn("priority", pri)
    scored
      .orderBy(round(col("priority"), 8).desc, key)
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(round(col("priority"), 8).desc, key)))
      .withColumn("priority", round(col("priority"), 4))
  }
}
