package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the manual levers for when AQE's runtime
  * skew-join splitting isn't available (aggregations; joins below its
  * thresholds). Results are exactly equal to the unsalted equivalents;
  * specs pin that.
  *
  * At 100 TB a single hot key (the empty document, the null user, the
  * default region) can pin one reducer for hours; salting spreads each
  * key's rows over `saltFactor` reducers at the cost of a second (tiny)
  * reduce step or a `saltFactor`× replication of the small side.
  */
object Skew {

  /** Deterministic-output salt. NOT a row hash: the canonical hot key is a
    * default-filled record duplicated verbatim, and identical rows hash
    * identically — a row-hash salt would put the entire hot key back on
    * one reducer. `rand(seed)` draws per-row from a per-partition-seeded
    * stream: which salt a row gets depends on partition layout, but every
    * salted operator here is salt-value-invariant (aggregates re-combine,
    * joins replicate the other side to all salts), so results stay
    * deterministic.
    */
  private def salt(saltFactor: Int): Column =
    floor(rand(42) * saltFactor).cast("int")

  /** Two-phase salted aggregation: partial aggregate on (keys, salt) —
    * spreading a hot key over `saltFactor` reducers — then final combine
    * on the keys. `partials` maps each output column to its (partial,
    * final) pair, e.g. count → (count, sum).
    */
  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: String,
      saltFactor: Int = 16): DataFrame = {
    df.withColumn("__salt", salt(saltFactor))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("total"))
  }

  /** Salted equi join for a skewed LEFT side against a small-ish right
    * side: left rows scatter over `saltFactor` sub-keys, the right side
    * replicates to every sub-key. Join output is row-identical to the
    * plain equi join for ANY salt assignment.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltFactor: Int = 16): DataFrame = {
    val l = left.withColumn("__salt", salt(saltFactor))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}
