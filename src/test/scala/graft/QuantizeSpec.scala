package graft

import graft.operators.Quantize
import org.apache.spark.sql.functions._

/** Scalar quantization: code range, reconstruction error bound, and the
  * flat-vector edge case.
  */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = {
    val rnd = new scala.util.Random(11)
    (0L until 50L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 4f - 2f))).toDF("vec_id", "embedding")
  }

  test("codes lie in [0,255]; min maps to 0, max to 255") {
    val q = Quantize.scalarQuantize(vecs)
      .select(col("vec_id"), explode(col("codes")).as("c"))
    val (lo, hi) = q.agg(min("c"), max("c")).as[(Int, Int)].head()
    assert(lo === 0 && hi === 255)
    val perVec = Quantize.scalarQuantize(vecs)
      .select(array_min(col("codes")).as("lo"), array_max(col("codes")).as("hi"))
      .as[(Int, Int)].collect()
    perVec.foreach { case (l, h) => assert(l === 0 && h === 255) }
  }

  test("dequantize reconstructs within half a quantization step") {
    val rows = Quantize.dequantize(Quantize.scalarQuantize(vecs))
      .select(col("embedding"), col("approx"), col("lo"), col("hi"))
      .collect()
    rows.foreach { r =>
      val orig = r.getSeq[Float](0)
      val approx = r.getSeq[Double](1)
      val step = (r.getDouble(3) - r.getDouble(2)) / 256.0
      orig.zip(approx).foreach { case (o, a) =>
        assert(math.abs(o - a) <= step / 2 + 1e-12, s"$o vs $a step=$step")
      }
    }
  }

  test("flat vector quantizes to all-zero codes") {
    val flat = Seq((1L, Array.fill(8)(0.5f))).toDF("vec_id", "embedding")
    val codes = Quantize.scalarQuantize(flat)
      .select(col("codes")).as[Seq[Int]].head()
    assert(codes === Seq.fill(8)(0))
  }
}
