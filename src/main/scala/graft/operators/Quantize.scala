package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar (int8-range) quantization of embedding columns — the standard
  * 4× shrink for vector stores: per-vector min/max affine map of each
  * float32 dimension onto 0..255. At 100 TB of embeddings the win is not
  * just storage: ANN candidate scans read a quarter of the bytes and the
  * codes stay exact-reconstructible to within half a step.
  *
  * Everything is per-row narrow arithmetic (no shuffle, whole-stage
  * codegen over higher-order functions); determinism comes from using
  * floor (bit-identical across engines) rather than round (whose .5 tie
  * rule differs between engines).
  */
object Quantize {

  /** Adds `codes`: array<int> with
    * code_i = min(255, floor((x_i - lo) * 256 / (hi - lo))), lo/hi the
    * vector's min/max (flat vectors quantize to all-zero codes), plus the
    * `lo`/`hi` reconstruction params.
    *
    * One pass through the compiled `scalar_quantize` kernel
    * (plans.ScalarQuantizeStruct). The previous HOF formulation
    * (`array_min/array_max/when` over five `transform` lambdas) paid ~5
    * interpreted dispatches per element per row — the honest-consumer
    * bench exposed it as 2.8s at sf0.1; VectorExpressionsSpec pins the
    * kernel element-for-element against that formulation.
    */
  def scalarQuantize(emb: DataFrame, vecCol: String = "embedding"): DataFrame = {
    graft.plans.GraftFunctions.ensure(emb.sparkSession)
    emb
      .withColumn("__q", graft.plans.GraftColumns.scalarQuantize(col(vecCol)))
      .withColumn("lo", col("__q.lo"))
      .withColumn("hi", col("__q.hi"))
      .withColumn("codes", col("__q.codes"))
      .drop("__q")
  }

  /** Reconstruction: code → lo + (code + 0.5) * (hi - lo) / 256 (bucket
    * midpoint). Max abs error = half a step = (hi-lo)/512.
    */
  def dequantize(quantized: DataFrame, outCol: String = "approx"): DataFrame =
    quantized.withColumn(outCol,
      transform(col("codes"), c =>
        col("lo") + (c.cast("double") + lit(0.5)) *
          (col("hi") - col("lo")) / lit(256.0)))
}
