package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable approximate quantiles via a LOG-LINEAR integer histogram —
  * the HdrHistogram/DDSketch bucket idea (Masson et al., VLDB 2019;
  * relative-error buckets, bucket-wise-sum merge) rebuilt on PURE INTEGER
  * arithmetic so a second engine reproduces the sketch bit for bit, the
  * same portability discipline as the KMV/CMS/HLL family
  * (`Sketches.scala`).
  *
  * Why not floating log buckets: DDSketch's `ceil(log(x)/log(γ))` puts a
  * libm call on the bucket boundary — two engines can disagree by one ulp
  * at a boundary value and the driver's exact hash gate would flag a
  * correct sketch. Here values are integer cents (the repo's established
  * exact-money idiom) and the bucket key is
  *
  *   bucket(v) = msb(v) · 2^(s+1) + (v >> max(0, msb(v) − s))
  *
  * with msb(v) = floor(log2 v) computed as `length(bin(v)) − 1` — string
  * length of the binary representation, exact in any engine. Within one
  * msb the shifted prefix keeps the top s+1 bits (sub-buckets of relative
  * width 2^−s ≈ 3% at s=5); across msbs the msb term dominates — so
  * bucket(v) is monotone in v, and quantiles walk buckets in ascending
  * key order. Values < 2^s index exactly (shift 0), the HdrHistogram
  * small-value property.
  *
  * Scale shape: the sketch is ONE map-side-combinable groupBy from corpus
  * rows to ≤ 64·2^(s+1) bucket rows per group (s=5 → ≤ 4096, typically
  * tens) — fixed-size output at any corpus size, mergeable by bucket-wise
  * COUNT SUM (associative/commutative; `QuantilesSpec` pins the law), the
  * daily-rollup shard story shared by every sketch here. Estimation is
  * a per-group cumulative walk over tens of rows. Works unchanged as a
  * complete-mode STREAMING aggregation (bounded per-group state =
  * bucket counts), like `Sketches.kmvDistinct`.
  *
  * The rank discipline mirrors `stats_percentile_disc`: rank = ceil(q·n)
  * (a real element's rank, not interpolation), and the estimate is the
  * integer midpoint of the bucket holding that rank — output stays exact
  * BIGINT cents end to end, so the driver hash gate has zero float
  * surface.
  */
object Quantiles {

  /** Sub-bucket precision: 2^-s relative bucket width (s=5 → ~3%). */
  val DefaultS = 5

  /** The log-linear bucket key of a positive integer column. All-integer:
    * msb from the binary-string length, the prefix via shiftright (the
    * SQL function accepts a column shift amount; the Scala DSL overload
    * does not).
    */
  def hdrBucket(v: Column, s: Int): Column = {
    val msb = (length(bin(v)) - 1).cast("long")
    val shift = greatest(lit(0L), msb - s)
    val shifted =
      call_function("shiftright", v.cast("long"), shift.cast("int"))
    msb * (1L << (s + 1)) + shifted
  }

  /** The sketch: per (group, bucket), occurrence count. Rows with
    * non-positive or null values are excluded (log buckets need v ≥ 1 —
    * shift the domain first if negatives matter).
    */
  def hdrSketch(df: DataFrame, group: String, centsCol: String,
      s: Int = DefaultS): DataFrame =
    df.select(col(group), col(centsCol).cast("long").as("__v"))
      .filter(col("__v") >= 1L)
      .select(col(group), hdrBucket(col("__v"), s).as("__bucket"))
      .groupBy(col(group), col("__bucket"))
      .agg(count(lit(1)).as("__n"))

  /** Merge two sketches: bucket-wise count sum (associative, commutative
    * — the law the spec pins; equals the sketch of the unioned inputs).
    */
  def hdrMerge(a: DataFrame, b: DataFrame, group: String): DataFrame =
    a.unionByName(b)
      .groupBy(col(group), col("__bucket"))
      .agg(sum(col("__n")).as("__n"))

  /** Integer midpoint of a bucket's value range — the quantile estimate
    * emitted for a rank that lands in the bucket. Exact integer
    * reconstruction of the encode: lo = low << shift, hi = lo + 2^shift − 1.
    */
  def hdrBucketMid(bucket: Column, s: Int): Column = {
    val msb = call_function("shiftright", bucket, lit(s + 1))
    val low = bucket % (1L << (s + 1))
    val shift = greatest(lit(0L), msb - s).cast("int")
    val lo = call_function("shiftleft", low, shift)
    val hi = lo + call_function("shiftleft", lit(1L), shift) - 1L
    call_function("shiftright", lo + hi, lit(1))
  }

  /** Quantile estimates from a (merged) sketch: for each q, the midpoint
    * of the bucket containing rank ceil(q·n) in ascending bucket order.
    * Output: (group, q, est_cents BIGINT) — one row per group × q.
    */
  def hdrQuantiles(sketch: DataFrame, group: String, qs: Seq[Double],
      s: Int = DefaultS): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1], got $qs")
    val w = Window.partitionBy(col(group)).orderBy(col("__bucket"))
    val cum = sketch
      .withColumn("__cum", sum(col("__n")).over(w))
      .withColumn("__total", sum(col("__n"))
        .over(Window.partitionBy(col(group))))
    val qCol = explode(array(qs.map(lit): _*)).as("q")
    // first bucket whose cumulative count reaches ceil(q·n): rank 1 of
    // the qualifying buckets under ascending bucket order
    val wq = Window.partitionBy(col(group), col("q")).orderBy(col("__bucket"))
    cum.select(col(group), col("__bucket"), col("__cum"), col("__total"),
        qCol)
      .filter(col("__cum") >= ceil(col("q") * col("__total")))
      .withColumn("__rn", row_number().over(wq))
      .filter(col("__rn") === 1)
      .select(col(group), col("q"),
        hdrBucketMid(col("__bucket"), s).as("est_cents"))
  }

  /** One-call sketch + estimate. */
  def hdrDistinctQuantiles(df: DataFrame, group: String, centsCol: String,
      qs: Seq[Double], s: Int = DefaultS): DataFrame =
    hdrQuantiles(hdrSketch(df, group, centsCol, s), group, qs, s)

  /** Cumulative frequency over a per-key integer value domain — the
    * building block of every exact percentile here: given a frequency
    * table (keys…, value, count), append `__cum` = running count in
    * ascending value order per key.
    *
    * Two regimes behind a DOMAIN-CARDINALITY gate (one aggregation, one
    * 1-row collect — the accepted bounds-probe idiom):
    *
    *  - domain ≤ `escalateAt` rows: the plain per-key window. One task
    *    walks each key's distinct-value domain — fine while the domain is
    *    orders of magnitude under the corpus (~10⁵ cents values vs 10⁸
    *    rows).
    *  - past the gate (pathological domains near |rows| — unique-valued
    *    columns, micro-timestamps): a RANGE-PARTITIONED two-phase prefix
    *    sum. Values bucket by a fixed-width integer shift of (value − lo)
    *    — monotone and engine-exact, no float boundary — sized so the
    *    per-key bucket count stays ≤ `targetBuckets`. Phase 1 cumsums the
    *    tiny per-(key, bucket) subtotal table for each bucket's offset
    *    (≤ targetBuckets rows per key); phase 2 windows WITHIN each
    *    (key, bucket) — parallel tasks of ~domain/targetBuckets rows —
    *    and adds the offset. No task ever sorts a whole key's domain.
    *    Fixed-width bucketing spreads any near-unique domain; it does not
    *    equalize an adversarially point-concentrated one (that shape
    *    would need quantile boundaries — and its concentrated values
    *    collapse the frequency table anyway, which is what the gate
    *    measures).
    *
    * `valueCol` must be integral (the repo's cents/ids discipline).
    * Results are identical in both regimes (QuantilesSpec pins equality
    * on a unique-values corpus).
    */
  def cumFreq(freq: DataFrame, keys: Seq[String], valueCol: String,
      cntCol: String, escalateAt: Long = 1L << 21,
      targetBuckets: Int = 4096): DataFrame = {
    val ks = keys.map(col)
    // materialize the frequency table ONCE before probing: the probe is
    // an action, and without the barrier it would execute the whole
    // corpus aggregation a second time when the chosen regime's plan
    // runs (measured +2.4s on approx_quantiles_hdr at sf10). The pinned
    // blocks are domain-sized — small by definition below the gate; for
    // a pathological domain the pin is still the cheaper currency than
    // a double corpus aggregation (and the bucketed-table pin is the
    // further escalation if storage memory ever objects).
    val fr = graft.plans.PlanBarriers.ckptKeepPartitioning(freq)
    val wPlain = Window.partitionBy(ks: _*).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val probe = fr.agg(count(lit(1)).as("__rows"),
      min(col(valueCol)).cast("long").as("__lo"),
      max(col(valueCol)).cast("long").as("__hi")).head()
    if (probe.getLong(0) <= escalateAt || probe.isNullAt(1))
      fr.withColumn("__cum", sum(col(cntCol)).over(wPlain))
    else {
      val lo = probe.getLong(1)
      val span = BigInt(probe.getLong(2)) - BigInt(lo) + 1
      var shift = 0
      while ((span >> shift) > targetBuckets) shift += 1
      val bktCols = ks :+ col("__bkt")
      val bFreq = freq.withColumn("__bkt",
        call_function("shiftright",
          col(valueCol).cast("long") - lit(lo), lit(shift)))
      val sub = bFreq.groupBy(bktCols: _*)
        .agg(sum(col(cntCol)).as("__bc"))
      // offsets: counts in strictly-earlier buckets; per key this window
      // walks ≤ targetBuckets subtotal rows, not the domain
      val wOff = Window.partitionBy(ks: _*).orderBy(col("__bkt"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = sub.withColumn("__off",
          coalesce(sum(col("__bc")).over(wOff), lit(0L)))
        .select((ks :+ col("__bkt") :+ col("__off")): _*)
      val wIn = Window.partitionBy(bktCols: _*).orderBy(col(valueCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      bFreq.join(offs, keys :+ "__bkt")
        .withColumn("__cum",
          sum(col(cntCol)).over(wIn) + col("__off"))
        .drop("__bkt", "__off")
    }
  }
}
