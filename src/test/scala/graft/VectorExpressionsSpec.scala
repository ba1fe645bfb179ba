package graft

import graft.functions.VectorFunctions._
import graft.plans.GraftFunctions
import org.apache.spark.sql.functions._

/** The codegen vec_dot kernel must be bit-identical to the HOF dot path —
  * oracle comparisons round to 4 decimals, so even tiny arithmetic drift
  * (different accumulation order) would eventually flip a boundary value.
  */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot ≡ HOF dot, bit-exact, incl. codegen path (seeded, 200 vecs)") {
    GraftFunctions.ensure(spark)
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(200)((
      Array.fill(64)(rnd.nextGaussian().toFloat),
      Array.fill(64)(rnd.nextGaussian().toFloat)))
    val df = rows.toDF("a", "b").select(
      dot($"a", $"b").as("hof"),
      dotFast($"a", $"b").as("gen"))
    assert(df.filter($"hof" =!= $"gen").count() === 0)
    // interpreted path too (eval via filter on literal-free collect)
    val vals = df.collect()
    assert(vals.forall(r => r.getDouble(0) == r.getDouble(1)))
  }

  test("hyperplane_sig ≡ HOF signature, bit-for-bit (seeded, widths 1/8/56/63)") {
    GraftFunctions.ensure(spark)
    val rnd = new scala.util.Random(7)
    // varied dims incl. 1 and odd lengths; float corpus like the real table
    val rows = Seq.tabulate(120)(i =>
      Tuple1(Array.fill(1 + i % 67)(rnd.nextGaussian().toFloat)))
    val df = rows.toDF("v")
    for (nBits <- Seq(1, 8, 56, 63)) {
      val bad = df.select(
          hyperplaneSignature($"v", nBits).as("gen"),
          hyperplaneSignatureHof($"v", nBits).as("hof"))
        .filter($"gen" =!= $"hof").count()
      assert(bad === 0, s"nBits=$nBits")
    }
  }

  test("hyperplane_sig null semantics and double arrays") {
    GraftFunctions.ensure(spark)
    val df = Seq(Tuple1(null.asInstanceOf[Array[Double]]),
        Tuple1(Array(0.5, -1.5, 2.5)))
      .toDF("v").select(hyperplaneSignature($"v", 8).as("s"))
    val got = df.collect()
    assert(got(0).isNullAt(0))
    assert(!got(1).isNullAt(0))
  }

  test("hyperplane_sig: null ELEMENT and EMPTY array match HOF null-poisoning (sig 0)") {
    GraftFunctions.ensure(spark)
    val df = Seq(
        Tuple1(Array[java.lang.Double](null, 5.0)),
        Tuple1(Array.empty[java.lang.Double]),
        Tuple1(Array[java.lang.Double](1.0, -2.0)))
      .toDF("v").select(
        hyperplaneSignature($"v", 8).as("gen"),
        hyperplaneSignatureHof($"v", 8).as("hof"))
    val got = df.collect()
    assert(got(0).getLong(0) === 0L)
    assert(got(0).getLong(0) === got(0).getLong(1))
    assert(got(1).getLong(0) === 0L)
    assert(got(1).getLong(0) === got(1).getLong(1))
    assert(got(2).getLong(0) === got(2).getLong(1))
  }

  test("vec_dot null semantics: length mismatch and null input → null") {
    GraftFunctions.ensure(spark)
    val df = Seq(
      (Array(1.0f, 2.0f), Array(1.0f)),
      (null.asInstanceOf[Array[Float]], Array(1.0f)))
      .toDF("a", "b").select(dotFast($"a", $"b").as("d"))
    assert(df.collect().forall(_.isNullAt(0)))
  }

  test("vec_dot usable from SQL after registration") {
    GraftFunctions.ensure(spark)
    val got = spark.sql("SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
      "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").head().getDouble(0)
    assert(got === 11.0)
  }

  test("scalar_quantize ≡ the HOF formulation it replaced, element-for-" +
      "element (seeded vectors + flat/null/empty edges)") {
    import org.apache.spark.sql.functions._
    GraftFunctions.ensure(spark)
    val rnd = new scala.util.Random(4242)
    val vecs: Seq[Seq[Option[Float]]] =
      (1 to 150).map(_ => (1 to 64).map(_ =>
        Some((rnd.nextFloat() * 200 - 100)))) ++ Seq(
        Seq.fill(8)(Some(3.25f)),                       // flat → all zeros
        Seq(Some(1f), None, Some(5f)),                   // null element
        Seq(Some(2f), None, Some(2f)),                   // flat WITH null → 0s
        Seq.empty,                                       // empty array
        Seq(None, None),                                 // all-null
        Seq(Some(7.5f)))                                 // singleton (flat)
    val df = vecs.zipWithIndex
      .toDF("v", "id").select(col("id"), col("v").cast("array<float>").as("v"))
      .localCheckpoint()
    // the replaced HOF formulation, verbatim — the reference semantics
    val hofV = transform(col("v"), x => x.cast("double"))
    val hof = df
      .withColumn("lo", array_min(hofV))
      .withColumn("hi", array_max(hofV))
      .withColumn("codes",
        when(col("hi") === col("lo"), transform(hofV, _ => lit(0)))
          .otherwise(transform(hofV, x => least(lit(255),
            floor((x.cast("double") - col("lo")) * lit(256.0) /
              (col("hi") - col("lo"))).cast("int")))))
      .select("id", "lo", "hi", "codes")
    val kernel = graft.operators.Quantize.scalarQuantize(df, "v")
      .select("id", "lo", "hi", "codes")
    val h = hof.orderBy("id").collect().map(_.toString)
    val k = kernel.orderBy("id").collect().map(_.toString)
    assert(k.toSeq === h.toSeq)
  }
}
