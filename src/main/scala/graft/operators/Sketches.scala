package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate distinct counting via the KMV (k-minimum-values) sketch —
  * the mergeable distinct-count summary behind theta sketches. Unlike
  * `approx_count_distinct` (HyperLogLog++, whose register layout is an
  * engine-internal detail no second engine reproduces), KMV is built from
  * first principles on a portable hash: every engine that can compute
  * md5 and sort doubles produces the SAME sketch, the same estimate, bit
  * for bit — which is what lets the driver hash-gate an APPROXIMATE
  * aggregate exactly (`approx_distinct_kmv`).
  *
  * The sketch of a key set is its k smallest distinct hash values mapped
  * uniformly into [0, 1). With the k-th smallest at u_k, the estimator is
  * (k−1)/u_k (Bar-Yossef et al. 2002, the classic distinct-elements
  * sketch); when fewer than k distinct hashes exist the sketch IS the
  * distinct set and the count is exact. Sketches merge by unioning and
  * re-taking the k smallest — the law `SketchesSpec` pins — so partial
  * sketches built per partition / per day / per shard combine without
  * rescanning, the property that makes this a 100 TB operator (a daily
  * distinct-users rollup is a k-row-per-group parquet table, not a scan).
  *
  * Hash: the md5-hex polynomial over the 1e9+7 field shared with
  * `Sampling.weightedTopK` — deterministic, layout-independent,
  * mirrorable in ANSI SQL. Its ~1e9 granularity can alias two distinct
  * keys (birthday-bounded: ~n²/2e9 expected collisions), which perturbs
  * the ESTIMATE negligibly and both engines identically — parity is
  * never at risk.
  *
  * Scale shape: `kmvSketch` is ONE map-side-combining aggregation — the
  * `kmv_kmin` TypedImperativeAggregate (`plans.SketchAggregates`) carries
  * a ≤ k-element sorted set per group, so each input partition reduces to
  * at most k doubles per group BEFORE the single exchange; shuffle bytes
  * are k · groups · partitions regardless of corpus size. No collect, no
  * unbounded per-group state (collect_set would hold the full distinct
  * set in one buffer). The earlier two-exchange plan (distinct on
  * (group, hash), then a per-group k-smallest window) produced the
  * identical rows — the aggregate IS distinct-then-cut by construction —
  * but moved every distinct pair through the shuffle.
  */
object Sketches {

  /** md5-polynomial uniform in [0, 1) — the shared portable-hash
    * primitive (`Sampling.weightedTopK` uses the same construction),
    * computed by the compiled `md5_poly_hash` kernel (bit-identical to
    * the HOF fold it replaces — `Md5PolyHashSpec` pins the equality; the
    * HOF path paid ~6.5 µs/row of interpreted lambda dispatch, the
    * hidden floor under every sketch build).
    */
  private def uniform01(key: org.apache.spark.sql.Column) =
    graft.plans.GraftColumns.md5PolyHash(key)
      .cast("double") / lit(1000000007.0)

  /** The KMV sketch: per group, the k smallest distinct uniform hash
    * values of `key`. Columns: `<group>`, `__u` (ascending within each
    * group by construction of downstream consumers).
    */
  def kmvSketch(df: DataFrame, group: String, key: String,
      k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    graft.plans.GraftFunctions.ensure(df.sparkSession)
    df.select(col(group), uniform01(col(key)).as("__uh"))
      .groupBy(col(group))
      .agg(call_function("kmv_kmin", col("__uh"), lit(k)).as("__us"))
      .select(col(group), explode(col("__us")).as("__u"))
  }

  /** Estimate per group from a (merged) sketch: exact when the sketch
    * holds fewer than k values, (k−1)/u_k otherwise. `est_distinct` is
    * rounded to 4 decimals — far above double noise, far below the
    * estimator's own error — so engines agree bit-for-bit.
    */
  def kmvEstimate(sketch: DataFrame, group: String, k: Int): DataFrame =
    sketch.groupBy(col(group))
      .agg(count(lit(1)).as("sketch_size"), max(col("__u")).as("__uk"))
      .select(col(group), col("sketch_size"),
        when(col("sketch_size") < k, col("sketch_size").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) / col("__uk"), 4))
          .as("est_distinct"))

  /** Merge two sketches of the same k (union, re-take k smallest) —
    * associative and commutative; equals the sketch of the unioned
    * inputs (the law the spec pins).
    */
  def kmvMerge(a: DataFrame, b: DataFrame, group: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col(group)).orderBy(col("__u"))
    a.unionByName(b).distinct()
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** One-call distinct-count estimate in ONE aggregation: the `kmv_kmin`
    * buffer IS the sketch, so size and k-th value read straight off the
    * aggregate's array — no explode, no second groupBy. Works unchanged
    * on a STREAMING input (complete/update mode): the bounded buffer is
    * the aggregation state and partial-sketch merge is the state merge,
    * which is the streaming-distinct-rollup story at 100 TB (per-trigger
    * state is k doubles per group, never the distinct set).
    */
  def kmvDistinct(df: DataFrame, group: String, key: String,
      k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    graft.plans.GraftFunctions.ensure(df.sparkSession)
    df.select(col(group), uniform01(col(key)).as("__uh"))
      .groupBy(col(group))
      .agg(call_function("kmv_kmin", col("__uh"), lit(k)).as("__us"))
      .select(col(group), size(col("__us")).cast("long").as("sketch_size"),
        when(size(col("__us")) < k, size(col("__us")).cast("double"))
          .otherwise(round(lit((k - 1).toDouble) /
            element_at(col("__us"), -1), 4))
          .as("est_distinct"))
  }

  // ----------------------------------------------------------- Count-Min
  // The frequency twin of KMV: a d×w counter grid where each occurrence
  // increments one bucket per hash row, and a key's frequency estimate is
  // the MIN of its d counters (Cormode & Muthukrishnan 2005). One-sided
  // error: collisions only ADD, so est ≥ exact always (CountMinSpec pins
  // it), and est ≤ exact + εN with ε = e/w at the usual confidence.
  // Like KMV the construction is portable — row hashes are the
  // md5-polynomial over "i:key", so a second engine rebuilds the
  // identical grid and the identical estimates, letting the driver
  // hash-gate an approximate structure exactly.
  //
  // Scale shape: the sketch build is ONE map-side-combinable groupBy of
  // d·|corpus| exploded rows down to ≤ d·w rows — fixed output size
  // regardless of corpus, the property that makes CMS the streaming/
  // shard-mergeable heavy-hitter structure (grids merge by cell-wise
  // SUM; `cmsMerge` + the spec pin the law). Estimation joins candidate
  // probes (d rows per candidate) against the tiny grid — hash equi,
  // broadcast-sized.

  /** Per-row bucket of `key` under hash row `i` — the md5-polynomial of
    * "i:key" folded into [0, w), via the compiled `md5_poly_hash` kernel
    * (d hashes per row made this the most HOF-bound build of the family).
    */
  /** Row i's bucket from ONE base hash, Kirsch-Mitzenmacher double
    * hashing: g_i(x) = (h1 + i·h2) mod p mod w with h1 = the
    * md5-polynomial hash and h2 = 1 + (h1 mod (p−2)) derived from it
    * (never 0, so rows stay distinct). ONE md5 per input row instead of
    * one per (row, i) — the honest-consumer bench showed the d
    * per-row md5+concat passes were the grid's entire cost (d=4: ~4× the
    * hash work for the same error bounds; KM 2006 proves the derived
    * family preserves them). Pure BIGINT arithmetic, so the DuckDB
    * oracle derives the identical buckets from the identical base hash.
    */
  private val CmsP = 1000000007L
  private def cmsBucket(i: org.apache.spark.sql.Column,
      h: org.apache.spark.sql.Column, w: Int) =
    (h + i.cast("long") * (lit(1L) + h % lit(CmsP - 2))) % lit(CmsP) % w

  /** The CMS grid of `key` occurrences in `df`: columns __i, __bucket,
    * __n — at most d·w rows, absent cells meaning zero. */
  def cmsSketch(df: DataFrame, key: String, d: Int, w: Int): DataFrame = {
    require(d >= 1 && w >= 2, s"CMS needs d >= 1, w >= 2; got d=$d w=$w")
    graft.plans.GraftFunctions.ensure(df.sparkSession)
    df.select(graft.plans.GraftColumns
        .md5PolyHash(col(key).cast("string")).as("__h"))
      .select(col("__h"),
        explode(array((0 until d).map(i => lit(i)): _*)).as("__i"))
      .withColumn("__bucket", cmsBucket(col("__i"), col("__h"), w))
      .groupBy(col("__i"), col("__bucket"))
      .agg(count(lit(1)).as("__n"))
  }

  /** Frequency estimates for `keys(key)` from a grid: min over the d
    * probed counters, absent cells counting zero. */
  def cmsEstimate(sketch: DataFrame, keys: DataFrame, key: String,
      d: Int, w: Int): DataFrame = {
    graft.plans.GraftFunctions.ensure(keys.sparkSession)
    keys.select(col(key))
      .withColumn("__h", graft.plans.GraftColumns
        .md5PolyHash(col(key).cast("string")))
      .withColumn("__i",
        explode(array((0 until d).map(i => lit(i)): _*)))
      .withColumn("__bucket", cmsBucket(col("__i"), col("__h"), w))
      .join(sketch, Seq("__i", "__bucket"), "left")
      .na.fill(0L, Seq("__n"))
      .groupBy(col(key))
      .agg(min(col("__n")).as("est_n"))
  }

  /** Grids over disjoint shards merge by cell-wise sum — the law the
    * spec pins (merge-of-sketches == sketch-of-union). */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("__i"), col("__bucket"))
      .agg(sum(col("__n")).as("__n"))

  // ---------------------------------------------------------- HyperLogLog
  // The register-array distinct sketch itself, built PORTABLY: unlike
  // `approx_count_distinct` (HLL++ with engine-private register layout),
  // these registers come from the shared md5-polynomial hash, so a second
  // engine rebuilds the identical array and the identical estimate. The
  // ~30-bit hash splits as bucket = h mod 256 (p=8) and a 22-bit suffix
  // whose leading-zero rank is the register value rho = 23 − bitlen
  // (suffix = 0 → 23) — both pure integer/string ops. The estimator's
  // Σ 2^−M_j is a sum of dyadic rationals with denominator ≤ 2^23 over
  // ≤ 256 terms: every partial sum is EXACTLY representable in a double,
  // so the aggregation is order-independent — the property that lets a
  // float-summing aggregate through the driver's exact hash gate.
  // Flajolet et al. 2007's small-range correction (m·ln(m/zeros)) applies
  // under 2.5m with empty registers present.
  //
  // Scale shape: one map-side-combinable groupBy from corpus rows to
  // ≤ group×256 register rows — fixed-size output, mergeable by
  // register-wise MAX (`hllMerge`; duplicates need no pre-distinct,
  // max absorbs them), the same shard-rollup story as KMV/CMS.

  private val HllM = 256

  /** Register array per group: (group, __bucket, __m), absent buckets
    * meaning "never hit". ONE map-side-combining aggregation: the
    * `hll_regs` TypedImperativeAggregate (`plans.SketchAggregates`)
    * carries the 256-int register array as its buffer (register-wise MAX
    * merge — `hllMerge`'s law), so each partition reduces to one array
    * per group before the single exchange; the array then explodes back
    * to the row shape the estimator and oracle consume (stored rho+1,
    * 0 = absent — presence feeds linear counting's zeros term). The
    * earlier declarative plan produced identical rows through two
    * exchanges ((group, bucket) shuffle, then the estimate's).
    */
  def hllRegisters(df: DataFrame, group: String, key: String): DataFrame = {
    graft.plans.GraftFunctions.ensure(df.sparkSession)
    df.select(col(group),
        graft.plans.GraftColumns.md5PolyHash(col(key)).as("__h"))
      .groupBy(col(group))
      .agg(call_function("hll_regs", col("__h")).as("__regs"))
      .select(col(group), posexplode(col("__regs")).as(Seq("__bucket", "__s")))
      .filter(col("__s") > 0)
      .select(col(group), col("__bucket").cast("long").as("__bucket"),
        (col("__s") - 1).cast("int").as("__m"))
  }

  /** Estimate per group from (merged) registers; `est_distinct` rounded
    * to 4 decimals (cosmetic — the sum underneath is exact, see above).
    */
  def hllEstimate(regs: DataFrame, group: String): DataFrame = {
    val m = HllM.toDouble
    regs.groupBy(col(group))
      .agg(count(lit(1)).as("__present"),
        sum(pow(lit(2.0), -col("__m"))).as("__sp"))
      .select(col(group),
        (lit(HllM.toLong) - col("__present")).as("zeros"),
        (lit(0.7213 / (1.0 + 1.079 / m) * m * m) /
          (col("__sp") + (lit(HllM.toLong) - col("__present")).cast("double")))
          .as("__raw"))
      .select(col(group), col("zeros"),
        round(when(col("__raw") <= lit(2.5 * m) && col("zeros") > 0,
            lit(m) * log(lit(m) / col("zeros")))
          .otherwise(col("__raw")), 4).as("est_distinct"))
  }

  /** Register arrays merge by register-wise MAX — associative,
    * commutative, idempotent (the law the spec pins). */
  def hllMerge(a: DataFrame, b: DataFrame, group: String): DataFrame =
    a.unionByName(b)
      .groupBy(col(group), col("__bucket"))
      .agg(max(col("__m")).as("__m"))

  /** One-call HLL distinct estimate: registers + estimate. */
  def hllDistinct(df: DataFrame, group: String, key: String): DataFrame =
    hllEstimate(hllRegisters(df, group, key), group)
}
