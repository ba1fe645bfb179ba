package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain_long(bloomBytes, v)` — membership probe of a long
  * against a serialized `org.apache.spark.util.sketch.BloomFilter` (the
  * sketch `DataFrame.stat.bloomFilter` builds). The filter bytes must be a
  * foldable literal: the sketch is deserialized ONCE per executor (lazy
  * transient), then each row costs a handful of hash probes — the
  * constant-memory alternative to broadcasting a join relation when even
  * the "small" side has billions of distinct keys.
  *
  * One-sided error: `false` is definite absence, `true` may be a false
  * positive at the sketch's fpp — callers treat a positive as a CANDIDATE
  * and exact-verify downstream (see operators.Decontaminate).
  */
case class BloomMightContainLong(bloomBytes: Expression, child: Expression)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = bloomBytes
  override def right: Expression = child
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long"

  override def checkInputDataTypes(): TypeCheckResult =
    (bloomBytes.dataType, child.dataType) match {
      case (BinaryType, LongType) if bloomBytes.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, LongType) =>
        TypeCheckResult.TypeCheckFailure(
          "bloom_might_contain_long requires a FOLDABLE filter argument " +
            "(the sketch must deserialize once, not per row)")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain_long expects (binary, bigint), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  @transient private lazy val filter: BloomFilter = {
    val bytes = bloomBytes.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(bloom: Any, v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContainLong =
    copy(bloomBytes = newLeft, child = newRight)
}
