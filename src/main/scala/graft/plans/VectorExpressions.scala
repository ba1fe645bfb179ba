package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen kernel for the embedding hot loop. The higher-order
  * function formulation (`aggregate(zip_with(...))`) never enters
  * whole-stage codegen — every element bounces through interpreted lambda
  * dispatch and an intermediate array allocation per pair. This expression
  * compiles to a tight primitive `for` loop over the two float arrays
  * inside the generated code, with arithmetic bit-identical to the HOF
  * path (per-element float→double promotion, left-to-right double
  * accumulation) so oracle-rounded results are unchanged.
  *
  * Null semantics: null if either array is null or lengths differ
  * (mirrors zip_with's null-padding poisoning the sum).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects two float arrays or two double arrays, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private lazy val isFloat = elemType(left).contains(FloatType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      if (isFloat) while (i < n) {
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      } else while (i < n) {
        acc += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val get = if (isFloat) "getFloat" else "getDouble"
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $a.$get($i) * (double) $b.$get($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native kernel for the LSH hyperplane signature: `nBits` sign bits of
  * pseudo-random ±1 projections, weight(b, i) = parity of
  * xxhash64(b: int, i: int) — EXACTLY the arithmetic of the HOF
  * formulation (`VectorFunctions.hyperplaneSignatureHof`: per-element
  * double promotion, left-to-right accumulation per bit, `proj >= 0` sets
  * the bit), pinned bit-for-bit in VectorExpressionsSpec — including a
  * null ELEMENT poisoning every projection (signature 0). Sole deliberate
  * divergence: a null ARRAY yields null here (standard null-in/null-out)
  * where the HOF's when/otherwise collapses it to 0. The HOF path
  * recomputed every weight hash per ROW (nBits × dims interpreted lambda
  * dispatches + 2 hashes each); here the ±1 weight matrix is derived once
  * per vector length and cached, leaving a fused primitive loop per row.
  * Weights depend only on (nBits, length), so the cache stays tiny and
  * executor-local — nothing is broadcast at 1000 executors.
  */
case class HyperplaneSig(child: Expression, nBits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(nBits >= 1 && nBits <= 63, s"nBits must be 1..63, got $nBits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig expects array<float> or array<double>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def weights(n: Int): Array[Byte] = HyperplaneSig.weights(nBits, n)

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    // HOF parity: a null ELEMENT poisons every per-bit projection (null
    // propagates through the aggregate), so when(proj >= 0) is false for
    // all bits → signature 0. Mirror that exactly. An EMPTY array is the
    // same in the HOF — sequence(0, size-1) runs DOWNWARD to [0,-1], so
    // zip_with null-pads and poisons — so it is also signature 0 here
    // (NOT all-bits-set, which a bare acc=0.0 ≥ 0 loop would produce).
    if (n == 0) return 0L
    var j = 0
    while (j < n) {
      if (v.isNullAt(j)) return 0L
      j += 1
    }
    val w = weights(n)
    var sig = 0L
    var b = 0
    while (b < nBits) {
      var acc = 0.0
      var i = 0
      val off = b * n
      if (isFloat) while (i < n) {
        acc += w(off + i) * v.getFloat(i).toDouble
        i += 1
      } else while (i < n) {
        acc += w(off + i) * v.getDouble(i)
        i += 1
      }
      if (acc >= 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSig {
  /** Executor-global ±1 weight matrices keyed by (nBits, vector length):
    * `weights(nBits, n)(b * n + i)`. Lives on the companion (a JVM
    * singleton per executor), NOT on the expression instance — an
    * instance-level `@transient lazy val` is rebuilt per task
    * deserialization, so every task of every stage re-derived the
    * nBits×dims hash matrix. Here each executor derives each (nBits, n)
    * row set exactly once for the process lifetime; entries are a few KB
    * (64 × dims bytes at most) and the key space is the handful of
    * distinct embedding widths a job touches, so unbounded retention is
    * the right policy.
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Byte]]()

  private[plans] def weights(nBits: Int, n: Int): Array[Byte] =
    cache.computeIfAbsent((nBits.toLong << 32) | (n.toLong & 0xffffffffL),
      { _ =>
        val w = new Array[Byte](nBits * n)
        var b = 0
        while (b < nBits) {
          // seed chain identical to xxhash64(lit(b), i): both int32 inputs
          val seed = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(b, 42L)
          var i = 0
          while (i < n) {
            val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(i, seed)
            w(b * n + i) = if ((h & 1L) == 0L) 1 else -1
            i += 1
          }
          b += 1
        }
        w
      })
}

/** Bucket assignment against a SORTED bounds array: returns the count of
  * bounds strictly below the value — i.e. the equi-depth bucket id — via
  * binary search. Exists because the expression-tree alternative (a
  * left-deep chain of `when(v > b, 1)` adds, one per bound) is O(bounds)
  * deep and O(bounds) per row: at the shuffle-partition counts a 100 TB
  * job runs (thousands), deep Catalyst trees risk analyzer stack overflow
  * and the per-row cost dominates. Here the tree is one node and each row
  * costs O(log bounds).
  */
case class BucketBySortedBounds(child: Expression, bounds: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(bounds.nonEmpty, "need at least one bound")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bucket_sorted_bounds expects a double value, got ${t.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bucket_sorted_bounds"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[Double]
    // lower bound: first index whose bound is >= x == #bounds < x
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) < x) lo = mid + 1 else hi = mid
    }
    lo
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Registration: `GraftFunctions.ensure(spark)` for imperative use, or
  * `spark.sql.extensions=graft.plans.GraftSparkExtensions` for config-time
  * injection (the SparkSessionExtensions path).
  */
/** One-pass int8-range scalar quantization kernel:
  * array<float|double> → struct(lo double, hi double, codes array<int>),
  * with lo/hi the min/max over non-null elements and
  * code_i = least(255, floor((x_i − lo) · 256.0 / (hi − lo))) — the
  * EXACT arithmetic (and multiply-before-divide order) of the HOF
  * formulation `Quantize.scalarQuantize` replaced, pinned element-for-
  * element by VectorExpressionsSpec. The HOF plan dispatched ~5
  * interpreted `transform` lambdas per element per row (the cast pass
  * recomputed for lo, hi, and both `when` branches); this is one fused
  * primitive loop. Null semantics mirror the HOF exactly (spec-pinned,
  * quirks included): a flat vector (hi == lo, non-null) maps EVERY
  * element — null included — to 0 (`transform(_ => 0)` ignores its
  * input); in the non-flat branch a null element becomes 255, because
  * the HOF's `least(lit(255), floor(null ...))` hits Spark's
  * null-SKIPPING `least` and returns the literal; an all-null array
  * yields (null, null, all-255 codes) the same way; an empty array
  * yields (null, null, empty). A null ARRAY yields a null struct
  * (null-in/null-out) where the HOF produced a row of null fields —
  * observably identical through every field access.
  */
case class ScalarQuantizeStruct(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"scalar_quantize expects array<float> or array<double>, got " +
        other.simpleString)
  }

  override def dataType: DataType = StructType(Seq(
    StructField("lo", DoubleType, nullable = true),
    StructField("hi", DoubleType, nullable = true),
    StructField("codes", ArrayType(IntegerType, containsNull = true),
      nullable = true)))
  override def nullable: Boolean = true
  override def prettyName: String = "scalar_quantize"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    def at(i: Int): Double =
      if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
    var lo = Double.NaN
    var hi = Double.NaN
    var seen = false
    var i = 0
    // min/max under SPARK's double ordering (the HOF's array_min/array_max):
    // NaN sorts GREATEST, and -0.0 ties 0.0 (no update on a tie, so the
    // first-encountered zero representation wins, as in Spark's fold) —
    // a plain </> loop silently skips NaN and diverges from the reference
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = at(i)
        if (!seen) { lo = x; hi = x; seen = true }
        else {
          if (if (x.isNaN) false else lo.isNaN || x < lo) lo = x
          if (if (x.isNaN) !hi.isNaN else !hi.isNaN && x > hi) hi = x
        }
      }
      i += 1
    }
    val codes = new Array[Any](n)
    // flat check mirrors SQL `hi === lo`, where NaN equals NaN (Spark's
    // NaN semantics) — Java's primitive == would send an all-NaN vector
    // down the scaled branch and hand its null elements 255 instead of 0
    if (seen && (hi == lo || (hi.isNaN && lo.isNaN))) {
      java.util.Arrays.fill(codes.asInstanceOf[Array[AnyRef]],
        Integer.valueOf(0))
    } else if (seen) {
      val range = hi - lo
      i = 0
      while (i < n) {
        codes(i) =
          if (arr.isNullAt(i)) Integer.valueOf(255) // least() skips null
          else {
            // .toInt IS Spark's non-ANSI double→int cast (NaN→0,
            // ±Inf→Int.Max/Min); the previous .toLong.toInt mapped
            // +Inf to -1 where the HOF's cast+least yields 255
            val c = math.floor((at(i) - lo) * 256.0 / range).toInt
            Integer.valueOf(if (c > 255) 255 else c)
          }
        i += 1
      }
    } else {
      // every element null (or n == 0): the HOF's otherwise-branch also
      // collapses each null to least's 255 literal
      java.util.Arrays.fill(codes.asInstanceOf[Array[AnyRef]],
        Integer.valueOf(255))
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](if (seen) lo else null, if (seen) hi else null,
        new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)))
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Native argmin kernel for the Lloyd assignment step
  * (`KMeans.assignStep`): given a row vector and the broadcast centroid
  * array `array<struct<cluster, cv: array<double>>>`, returns
  * `struct<cluster, d2>` for the nearest centroid. Replaces the HOF
  * formulation `element_at(array_sort(transform(cents, …)), 1)`, whose
  * per-row cost was k interpreted lambda dispatches, k struct
  * allocations, and an O(k log k) struct sort — the measured bottleneck
  * that made scaled-k SemDeDup (k ∝ corpus, the published configuration)
  * pay more in assignment than it saved in pairs. Here the whole argmin
  * is one fused primitive loop: O(k·dims) flops, no allocation, no sort.
  *
  * Semantics mirror the replaced formulation exactly (pinned
  * element-for-element in VectorExpressionsSpec against
  * `KMeans.assignStepHof`):
  *  - d2 per centroid is the LEFT-TO-RIGHT fold Σ(x−c)² (bit-identical
  *    accumulation order to `aggregate(zip_with(...))`);
  *  - a null vector, null centroid array, length mismatch, or any null
  *    ELEMENT poisons that centroid's d2 to null (zip_with null padding
  *    semantics);
  *  - ranking is by (round(d2, 6), cluster) ascending with the struct
  *    sort's null placement: null d2 sorts FIRST (a mismatched-length
  *    centroid outranks every real distance — empirically pinned), NaN
  *    sorts last, null cluster wins its tie group;
  *  - the winner reports its RAW d2 (not the rounded ranking key);
  *  - round(d2, 6) mirrors Catalyst Round on doubles: NaN/Inf pass
  *    through, else scala BigDecimal HALF_UP.
  * Divergence (unreachable from assignStep): an EMPTY centroid array
  * yields null where ANSI element_at(…, 1) would raise — assignStep's
  * aggregated collect_list is never empty for a nonempty centroid table.
  * A full (rounded d2, cluster) tie falls to the struct's third sort
  * field, the RAW d2 — reachable when cluster ids repeat (fit seeds
  * cluster ids from corpus ids via orderBy(xxhash64).limit(k), and a
  * dirty corpus can carry duplicate ids), with the incumbent kept on an
  * exact raw tie (array_sort is stable).
  *
  * The rounding itself is BigDecimal-based (expensive), so the loop only
  * rounds candidates within 2e-6 of the incumbent. That fixed margin is
  * sound at EVERY magnitude, by two regimes: (a) ulp(x) ≤ 1e-6 — the
  * 6-decimal rounding moves the exact value ≤5e-7 and its nearest-double
  * round-trip adds ≤ulp/2 ≤ 5e-7, so |round6(x)−x| ≤ 1e-6 and a collapse
  * round6(y) ≤ round6(x) forces y−x ≤ 2e-6; (b) ulp(x) > 1e-6 (x ≳ 2^33)
  * — the 6-decimal rounding lands within 5e-7 < ulp/2 of x, so its
  * nearest double IS x: round6 is the identity, distinct doubles never
  * collapse, and the rounded compare degenerates to the raw compare
  * (verified by scanning 20k consecutive-double pairs at 2e10: zero
  * collapses). On real data almost every centroid is rejected by the
  * raw-double compare and the BigDecimal path runs O(1) times per row.
  */
case class NearestCentroid(vec: Expression, cents: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def left: Expression = vec
  override def right: Expression = cents

  private lazy val centStruct: StructType = cents.dataType match {
    case ArrayType(s: StructType, _) => s
    case _ => null
  }

  // the vector side reads float OR double elements natively — the
  // widening is exact, so skipping the cast-transform keeps the hot path
  // free of per-element lambda dispatch without changing a single bit
  private lazy val vecIsFloat: Boolean = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
      case _ => false
    }
    val centsOk = centStruct != null && centStruct.length == 2 &&
      (centStruct(1).dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      })
    if (vecOk && centsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "nearest_centroid expects (array<float|double>, array<struct<cluster, " +
        s"array<double>>>), got (${vec.dataType.simpleString}, " +
        s"${cents.dataType.simpleString})")
  }

  private lazy val clusterType: DataType = centStruct(0).dataType

  private lazy val clOrdering =
    org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(clusterType).asInstanceOf[Ordering[Any]]

  override def dataType: DataType = StructType(Seq(
    StructField("cluster", clusterType),
    StructField("d2", DoubleType)))
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"

  /** Catalyst Round semantics on doubles at scale 6. */
  private def round6(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Struct-sort cluster tie-break: nulls first, else type ordering. */
  private def clusterLt(a: Any, b: Any): Boolean =
    if (a == null) b != null
    else if (b == null) false
    else clOrdering.lt(a, b)

  override def eval(
      input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val centsV = cents.eval(input)
    if (centsV == null) return null
    val ca = centsV.asInstanceOf[ArrayData]
    val k = ca.numElements()
    if (k == 0) return null
    val vv = vec.eval(input)
    val va = if (vv == null) null else vv.asInstanceOf[ArrayData]
    var bestCl: Any = null
    var bestDrNull = true
    var bestDr = 0.0
    var bestDraw: Any = null
    var first = true
    var i = 0
    while (i < k) {
      val s = ca.getStruct(i, 2)
      val cl = if (s.isNullAt(0)) null else s.get(0, clusterType)
      val cva = if (s.isNullAt(1)) null else s.getArray(1)
      var d2Null = false
      var d2 = 0.0
      if (va == null || cva == null ||
          va.numElements() != cva.numElements()) d2Null = true
      else {
        val n = va.numElements()
        var j = 0
        while (!d2Null && j < n) {
          if (va.isNullAt(j) || cva.isNullAt(j)) d2Null = true
          else {
            val x = if (vecIsFloat) va.getFloat(j).toDouble
                    else va.getDouble(j)
            val d = x - cva.getDouble(j)
            d2 += d * d
            j += 1
          }
        }
      }
      if (first) {
        first = false
        bestCl = cl
        if (d2Null) { bestDrNull = true; bestDraw = null }
        else {
          bestDrNull = false; bestDr = round6(d2)
          bestDraw = java.lang.Double.valueOf(d2)
        }
      } else if (d2Null) {
        if (!bestDrNull) { bestCl = cl; bestDrNull = true; bestDraw = null }
        else if (clusterLt(cl, bestCl)) { bestCl = cl; bestDraw = null }
      } else if (!bestDrNull) {
        // fast reject: > 2e-6 above the incumbent's rounded key cannot
        // round to ≤ it at ANY magnitude (two-regime proof in the
        // scaladoc); NaN incumbent must take the slow path (any real
        // candidate beats it, but NaN arithmetic fails the fast test);
        // +Inf vs +Inf incumbent likewise (Inf − Inf = NaN fails the
        // margin test, but the HOF sort ties the two and falls to the
        // cluster tie-break)
        if (java.lang.Double.isNaN(bestDr) || d2 - bestDr <= 2e-6 ||
            (java.lang.Double.isInfinite(d2) && d2 == bestDr)) {
          val dr = round6(d2)
          val cmp = java.lang.Double.compare(dr, bestDr)
          // full-key mirror of the HOF struct sort (dr, cluster, draw):
          // equal rounded keys fall to the cluster tie-break; equal
          // clusters (duplicate ids) fall to the RAW d2; an exact raw tie
          // keeps the incumbent (array_sort stability)
          val clustersEqual = !clusterLt(cl, bestCl) && !clusterLt(bestCl, cl)
          val wins = cmp < 0 || (cmp == 0 && (clusterLt(cl, bestCl) ||
            (clustersEqual && java.lang.Double.compare(d2,
              bestDraw.asInstanceOf[java.lang.Double].doubleValue()) < 0)))
          if (wins) {
            bestCl = cl; bestDr = dr
            bestDraw = java.lang.Double.valueOf(d2)
          }
        }
      } // else: incumbent has null d2 (sorts first) — real candidate loses
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](
        org.apache.spark.sql.catalyst.InternalRow.copyValue(bestCl),
        bestDraw))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, cents = newRight)
}

object GraftFunctions {

  private def intLit(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int width, got $other")
  }

  private def doubleArrLit(e: Expression, fn: String): Array[Double] = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(
        a: org.apache.spark.sql.catalyst.util.ArrayData,
        ArrayType(DoubleType, _)) =>
      a.toDoubleArray()
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal array<double>, got $other")
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => FloatVecDot(args(0), args(1))),
    (new FunctionIdentifier("shingle_hash_set"),
      new ExpressionInfo(classOf[ShingleHashSet].getName, "shingle_hash_set"),
      (args: Seq[Expression]) =>
        ShingleHashSet(args(0), intLit(args(1), "shingle_hash_set"))),
    (new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) =>
        MinHashSig(args(0), intLit(args(1), "minhash_sig"))),
    (new FunctionIdentifier("simhash_sig"),
      new ExpressionInfo(classOf[SimHashSig].getName, "simhash_sig"),
      (args: Seq[Expression]) => SimHashSig(args(0))),
    (new FunctionIdentifier("bucket_sorted_bounds"),
      new ExpressionInfo(classOf[BucketBySortedBounds].getName, "bucket_sorted_bounds"),
      (args: Seq[Expression]) =>
        BucketBySortedBounds(args(0),
          doubleArrLit(args(1), "bucket_sorted_bounds"))),
    (new FunctionIdentifier("hyperplane_sig"),
      new ExpressionInfo(classOf[HyperplaneSig].getName, "hyperplane_sig"),
      (args: Seq[Expression]) =>
        HyperplaneSig(args(0), intLit(args(1), "hyperplane_sig"))),
    (new FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName, "sorted_intersect_size"),
      (args: Seq[Expression]) => SortedIntersectSize(args(0), args(1))),
    (new FunctionIdentifier("bloom_might_contain_long"),
      new ExpressionInfo(classOf[BloomMightContainLong].getName, "bloom_might_contain_long"),
      (args: Seq[Expression]) => BloomMightContainLong(args(0), args(1))),
    (new FunctionIdentifier("kmv_kmin"),
      new ExpressionInfo(classOf[KMinDistinct].getName, "kmv_kmin"),
      (args: Seq[Expression]) =>
        KMinDistinct(args(0), intLit(args(1), "kmv_kmin"))),
    (new FunctionIdentifier("hll_regs"),
      new ExpressionInfo(classOf[HllRegs].getName, "hll_regs"),
      (args: Seq[Expression]) => HllRegs(args(0))),
    (new FunctionIdentifier("md5_poly_hash"),
      new ExpressionInfo(classOf[Md5PolyHash].getName, "md5_poly_hash"),
      (args: Seq[Expression]) => Md5PolyHash(args(0))),
    (new FunctionIdentifier("scalar_quantize"),
      new ExpressionInfo(classOf[ScalarQuantizeStruct].getName, "scalar_quantize"),
      (args: Seq[Expression]) => ScalarQuantizeStruct(args(0))),
    (new FunctionIdentifier("nearest_centroid"),
      new ExpressionInfo(classOf[NearestCentroid].getName, "nearest_centroid"),
      (args: Seq[Expression]) => NearestCentroid(args(0), args(1))))

  /** Idempotently register into a session's function registry. */
  def ensure(spark: SparkSession): Unit =
    all.foreach { case (ident, _, builder) =>
      if (!spark.sessionState.functionRegistry.functionExists(ident)) {
        spark.sessionState.functionRegistry
          .createOrReplaceTempFunction(ident.funcName, builder, "built-in")
      }
    }
}

/** `SparkSessionExtensions` entry point (spark.sql.extensions): kernel
  * functions + the distance-join grid rewrite rule.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => DistanceJoinRewrite)
  }
}
