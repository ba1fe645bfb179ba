package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, written with
  * higher-order functions (`zip_with`/`aggregate`/`transform`) so the whole
  * computation stays inside Catalyst codegen — no UDF round trips. All
  * arithmetic is promoted to double before accumulation, matching what the
  * DuckDB oracle (`list_cosine_similarity` et al.) computes.
  */
object VectorFunctions {

  /** Element-wise cast to double. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0),
      (acc, x) => acc + x)

  /** Codegen'd dot product (graft.plans.FloatVecDot): bit-identical
    * arithmetic to `dot`, compiled to a primitive loop. Requires
    * `GraftFunctions.ensure(spark)` (the operators call it).
    */
  def dotFast(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  def norm2Fast(a: Column): Column = sqrt(dotFast(a, a))

  def cosineSimilarity(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(toDouble(a), toDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, x) => acc + x))

  /** SimHash-style sign bits against `nBits` pseudo-random hyperplanes.
    * The hyperplanes are derived deterministically from (bit, dim) via
    * xxhash64, so signatures are reproducible across runs and executors
    * with zero driver-side state to ship — at 1000 executors nothing is
    * broadcast, the "random" planes are recomputed from the hash.
    *
    * Returns a LongType signature with `nBits` (≤ 63) sign bits: the LSH
    * bucketing primitive for approximate nearest neighbours. Computed by
    * the native `hyperplane_sig` kernel (graft.plans.HyperplaneSig) — one
    * fused loop with a per-length weight cache; the HOF formulation below
    * re-derived every ±1 weight per row per bit, which dominated wide
    * multi-table signatures (56 bits × 64 dims ≈ 3.6k hashes PER ROW).
    * Requires `GraftFunctions.ensure(spark)` (the operators call it).
    */
  def hyperplaneSignature(v: Column, nBits: Int): Column = {
    require(nBits > 0 && nBits <= 63, s"nBits must be 1..63, got $nBits")
    graft.plans.GraftColumns.hyperplaneSig(v, nBits)
  }

  /** The original HOF formulation of `hyperplaneSignature` — kept as the
    * independent reference implementation the kernel is pinned against in
    * VectorExpressionsSpec (bit-for-bit equality).
    */
  private[graft] def hyperplaneSignatureHof(v: Column, nBits: Int): Column = {
    require(nBits > 0 && nBits <= 63, s"nBits must be 1..63, got $nBits")
    val bits = (0 until nBits).map { b =>
      // pseudo-random ±1 weight per (bit, dimension): parity of xxhash64
      val proj = aggregate(
        zip_with(toDouble(v), sequence(lit(0), size(v) - 1), (x, i) =>
          when(pmod(xxhash64(lit(b), i), lit(2)) === 0, x).otherwise(-x)),
        lit(0.0),
        (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Hamming distance between two signature longs (for simhash near-dup). */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
