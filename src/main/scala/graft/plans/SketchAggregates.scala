package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded k-minimum-distinct-values aggregate — the one-exchange plan for
  * the KMV sketch (`graft.operators.Sketches`). The declarative
  * formulation (`distinct` on (group, hash) then a per-group k-smallest
  * window) pays TWO exchanges: the distinct shuffle moves every distinct
  * (group, hash) pair, then rows already clustered run a row_number
  * window. This aggregate carries a ≤ k-element sorted set as its buffer,
  * so the map side reduces each partition to AT MOST k doubles per group
  * before anything shuffles — one exchange, shuffle bytes bounded by
  * k · groups · partitions regardless of corpus size, which is the shape
  * a 100 TB distinct-count rollup needs.
  *
  * Semantics are identical to the declarative plan by construction:
  * `TreeSet` membership IS double equality (the `distinct()` it
  * replaces), insertion keeps the k smallest (the `row_number <= k` cut),
  * and `eval` emits them ascending — so the sketch, the estimate, and the
  * driver's DuckDB oracle hash are unchanged. Merge trims after union,
  * which is exactly `kmvMerge`'s law (union, re-take k smallest);
  * associativity/commutativity follow from set union, so partial buffers
  * combine in any shuffle order.
  *
  * Buffer values are uniform hashes in [0, 1) — no NaN/±0.0 ordering
  * edge can arise. Not codegen'd (TypedImperativeAggregate never is),
  * but the hash projection feeding it stays in whole-stage codegen and
  * the per-row cost is an O(log k) tree probe with an early reject
  * (`v >= last` once full) on the sorted tail.
  */
case class KMinDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Double]]
  with UnaryLike[Expression] {

  require(k >= 2, s"kmv_kmin needs k >= 2, got $k")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Double] =
    new java.util.TreeSet[java.lang.Double]()

  private def insert(buf: java.util.TreeSet[java.lang.Double],
      v: Double): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Double],
      input: InternalRow): java.util.TreeSet[java.lang.Double] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Double],
      other: java.util.TreeSet[java.lang.Double]): java.util.TreeSet[java.lang.Double] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Double]): Any = {
    val arr = new Array[Double](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putDouble(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getDouble); i += 1 }
    buf
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_kmin expects a double column, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_kmin"

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KMinDistinct =
    copy(child = newChild)
}

/** One-exchange register build for the portable HyperLogLog sketch
  * (`Sketches.hllRegisters`): the buffer is the m=256 register array
  * itself (one int per register, storing rho+1 so 0 means "bucket never
  * hit" — presence matters: a register legitimately holding rho 0 is
  * distinct from an absent one for the linear-counting zeros term).
  * Input is the md5-polynomial hash long; bucket/rho split happens here
  * in integer JVM arithmetic, identical to the declarative split
  * (`h % 256`, `rho = 23 − bitlen(h div 256)`, suffix 0 → 23). Merge is
  * register-wise MAX — exactly `hllMerge`'s law — so partial arrays
  * combine in any order, map-side-combined before the ONE exchange
  * (the declarative plan shuffled (group, bucket) pairs then aggregated
  * again for the estimate). `eval` returns the 256-int array; callers
  * explode it back to the (bucket, m) row shape the estimator and the
  * DuckDB oracle both consume, so hashes are unchanged.
  */
case class HllRegs(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]]
  with UnaryLike[Expression] {

  private val M = 256

  override def createAggregationBuffer(): Array[Int] = new Array[Int](M)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val bucket = (h % M).toInt
      val rest = h / M
      val rho =
        if (rest == 0L) 23
        else 23 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
      val stored = rho + 1
      if (stored > buf(bucket)) buf(bucket) = stored
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i < M) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Int]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * M)
    var i = 0
    while (i < M) { bb.putInt(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Int](M)
    var i = 0
    while (i < M) { buf(i) = bb.getInt; i += 1 }
    buf
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_regs expects a long hash column, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hll_regs"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllRegs =
    copy(child = newChild)
}
