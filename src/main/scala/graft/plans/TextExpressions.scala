package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the text-dedup hot path. The HOF formulations
  * (`transform`/`aggregate`/`zip_with`) evaluate one interpreted lambda
  * dispatch PER ARRAY ELEMENT (and per signature slot); these expressions
  * drop to a single compiled JVM loop per row. They are `CodegenFallback`
  * deliberately: the cost model is one virtual call per ROW into tight
  * Scala, which is within noise of full codegen for array-heavy kernels —
  * unlike the per-element interpreted dispatch they replace.
  *
  * Hashing uses xxhash64 (same family Spark's `xxhash64` builtin uses)
  * via spark-unsafe's XXH64. Only hash EQUALITY matters downstream
  * (join keys / min-slots / bit sources), so no bit-compat with the old
  * HOF-built signatures is required — operators' outputs are either
  * exact-verified (MinHash LSH) or threshold-checked on the planted spec
  * corpus (SimHash).
  */
object TextKernels {

  val P: Long = 1000000007L

  /** xxhash64 of a UTF8String with a given seed. */
  @inline def hashStr(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  @inline def hashLong(v: Long, seed: Long): Long = XXH64.hashLong(v, seed)
}

/** Column-API wrappers for the kernel expressions. The kernels resolve
  * through the session function registry (GraftFunctions.ensure /
  * GraftSparkExtensions), so width parameters travel as int literals.
  */
object GraftColumns {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{call_function, lit}

  def shingleHashSet(toks: Column, n: Int): Column =
    call_function("shingle_hash_set", toks, lit(n))
  def minhashSig(hashes: Column, numHashes: Int): Column =
    call_function("minhash_sig", hashes, lit(numHashes))
  def simhashSig(hashes: Column): Column =
    call_function("simhash_sig", hashes)
  def sortedIntersectSize(a: Column, b: Column): Column =
    call_function("sorted_intersect_size", a, b)
  def hyperplaneSig(v: Column, nBits: Int): Column =
    call_function("hyperplane_sig", v, lit(nBits))
  def bucketBySortedBounds(v: Column, bounds: Array[Double]): Column =
    call_function("bucket_sorted_bounds", v, lit(bounds))
  def bloomMightContainLong(bloomBytes: Column, v: Column): Column =
    call_function("bloom_might_contain_long", bloomBytes, v)
  def md5PolyHash(s: Column): Column =
    call_function("md5_poly_hash", s.cast("string"))
  def scalarQuantize(v: Column): Column =
    call_function("scalar_quantize", v)
}

/** array<string> tokens → array<long> distinct hashes of the n-token
  * shingle windows, SORTED ascending — downstream set algebra
  * (sorted_intersect_size) is then a linear merge instead of per-row hash
  * sets. Docs shorter than n hash the whole token sequence as one shingle.
  */
case class ShingleHashSet(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash_set expects array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val len = toks.numElements()
    // chain-hash the window tokens: h = xxh64(tok_j, h) starting from the
    // window width, so ("a","bc") never collides with ("ab","c") except by
    // genuine 64-bit accident
    def windowHash(start: Int, width: Int): Long = {
      var h = width.toLong
      var j = 0
      while (j < width) {
        h = TextKernels.hashStr(toks.getUTF8String(start + j), h)
        j += 1
      }
      h
    }
    if (len < n) new GenericArrayData(Array(windowHash(0, len)))
    else {
      val seen = new java.util.HashSet[java.lang.Long]()
      val out = new Array[Long](len - n + 1)
      var k = 0
      var i = 0
      while (i <= len - n) {
        val h = windowHash(i, n)
        if (seen.add(h)) { out(k) = h; k += 1 }
        i += 1
      }
      val trimmed = java.util.Arrays.copyOf(out, k)
      java.util.Arrays.sort(trimmed)
      new GenericArrayData(trimmed)
    }
  }

  override def prettyName: String = "shingle_hash_set"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<long> shingle hashes → array<long> MinHash signature of width
  * `numHashes`, via Kirsch-Mitzenmacher double hashing:
  * slot_i = min over shingles of (h1 + i·h2), h1/h2 = seeded xxhash64
  * reduced into [0, P).
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  require(numHashes >= 1)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<long>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val slots = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val m = hs.numElements()
    while (i < m) {
      val s = hs.getLong(i)
      val h1 = java.lang.Math.floorMod(TextKernels.hashLong(s, 1L), TextKernels.P)
      val h2 = java.lang.Math.floorMod(TextKernels.hashLong(s, 2L), TextKernels.P)
      var k = 0
      var v = h1
      while (k < numHashes) {
        if (v < slots(k)) slots(k) = v
        // Kirsch-Mitzenmacher slot k+1 = (h1 + (k+1)·h2) mod P. The mod is
        // LOAD-BEARING: without it large-k slots order by h2 alone, so one
        // min-h2 shingle dominates every high slot — slots decorrelate from
        // true Jaccard and 0.98-similar docs measurably miss (4/256 pairs
        // at sf0.1 before this reduction was added).
        v += h2
        if (v >= TextKernels.P) v -= TextKernels.P
        k += 1
      }
      i += 1
    }
    new GenericArrayData(slots)
  }

  override def prettyName: String = "minhash_sig"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** |A ∩ B| for two SORTED array<long> OR array<int> (both sides the same
  * width): one linear merge pass, no per-row allocation — replaces
  * `size(array_intersect(a, b))`, which builds a boxed hash set per row
  * and dominated the dedup verify stage. The int overload exists for
  * graph adjacency payloads: when node ids fit an int the caller can run
  * the WHOLE pipeline at half width (Graph.triangleCount's adaptive
  * compaction — the Σ outdeg² array exchange is the dominant shuffle at
  * scale and element width is a straight 2× on its bytes).
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_size expects two array<long> or two array<int>, got " +
          s"${l.simpleString}, ${r.simpleString}")
    }

  override def dataType: DataType = IntegerType

  private lazy val intElems = left.dataType match {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var common = 0
    if (intElems) {
      while (i < na && j < nb) {
        val va = a.getInt(i)
        val vb = b.getInt(j)
        if (va == vb) { common += 1; i += 1; j += 1 }
        else if (va < vb) i += 1
        else j += 1
      }
    } else {
      while (i < na && j < nb) {
        val va = a.getLong(i)
        val vb = b.getLong(j)
        if (va == vb) { common += 1; i += 1; j += 1 }
        else if (va < vb) i += 1
        else j += 1
      }
    }
    common
  }

  override def prettyName: String = "sorted_intersect_size"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** array<long> shingle hashes → 64-bit SimHash signature: per-bit ±1 vote
  * from each hash's bit, sign-packed (same ±1 vote and >= 0 sign rule as
  * the HOF formulation it replaces).
  */
case class SimHashSig(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig expects array<long>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val counters = new Array[Long](64)
    var i = 0
    val m = hs.numElements()
    while (i < m) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 64) {
        counters(b) += (if (((h >>> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def prettyName: String = "simhash_sig"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The PORTABLE md5-polynomial hash as one compiled kernel — equivalent
  * by construction to the HOF formulation
  * `TextFunctions.rollingHash(md5(s))` (split the lowercase md5 hex into
  * chars, fold `acc · 31 + ascii(c) mod 1e9+7`): md5 hex is already
  * lowercase with no whitespace, so the HOF's normText pass is identity
  * and the fold is a 32-step integer loop. The HOF path evaluates ~35
  * interpreted lambda dispatches per ROW (measured ~6.5 µs/row — it was
  * the hidden floor under every sketch build); this kernel is one
  * DigestUtils.md5Hex (the same primitive Spark's `md5` builtin calls)
  * plus a tight loop. Used by the KMV/CMS/HLL sketch builds and
  * deterministic sampling; the oracle SQL is unchanged (it restates the
  * same fold over DuckDB's md5 hex).
  */
case class Md5PolyHash(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_poly_hash expects a string, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val hex = org.apache.commons.codec.digest.DigestUtils
      .md5Hex(input.asInstanceOf[UTF8String].getBytes)
    var acc = 0L
    var i = 0
    while (i < hex.length) {
      acc = (acc * 31L + hex.charAt(i).toLong) % TextKernels.P
      i += 1
    }
    acc
  }

  override def prettyName: String = "md5_poly_hash"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
