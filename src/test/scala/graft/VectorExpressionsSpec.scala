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
        Seq(Some(7.5f)),                                 // singleton (flat)
        // non-finite edges: Spark's ordering makes NaN the MAX and treats
        // NaN === NaN as true; its double→int cast maps NaN→0, ±Inf→extremes
        Seq(Some(1f), Some(Float.NaN), Some(5f)),        // NaN becomes hi
        Seq(Some(Float.NaN), Some(Float.NaN)),           // all-NaN (flat!)
        Seq(Some(Float.NaN), None, Some(Float.NaN)),     // all-NaN + null
        Seq(Some(Float.NaN), Some(2f)),                  // NaN first
        Seq(Some(1f), Some(Float.PositiveInfinity)),     // +Inf element
        Seq(Some(Float.NegativeInfinity), Some(1f)),     // -Inf element
        Seq(Some(Float.NegativeInfinity), Some(Float.PositiveInfinity),
          Some(0f)),                                     // both infinities
        Seq(Some(-0f), Some(0f)),                        // signed-zero tie
        Seq(Some(0f), Some(-0f)))                        // ...both orders
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

  /** The argmin kernel must reproduce the HOF rank-sort it replaced
    * row-for-row: same winner under rounding ties, same null placement
    * (null d2 sorts FIRST), same raw-d2 reporting. The comparisons below
    * never hand-compute expectations — the HOF plan IS the spec.
    */
  private def assignBoth(emb: org.apache.spark.sql.DataFrame,
      cents: org.apache.spark.sql.DataFrame): Unit = {
    val cols = Seq("vec_id", "cluster", "d2").map(col)
    val kr = graft.operators.KMeans.assignStep(emb, cents)
      .select(cols: _*).orderBy("vec_id").collect().map(_.toString)
    val hr = graft.operators.KMeans.assignStepHof(emb, cents)
      .select(cols: _*).orderBy("vec_id").collect().map(_.toString)
    assert(kr.toSeq === hr.toSeq)
  }

  test("nearest_centroid ≡ HOF rank-sort: seeded 300×16 float corpus, " +
      "string clusters from labelCentroids") {
    GraftFunctions.ensure(spark)
    val rnd = new scala.util.Random(11)
    val emb = Seq.tabulate(300)(i => (i.toLong, s"L${i % 7}",
        Array.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "label", "embedding")
    assignBoth(emb, graft.operators.KMeans.labelCentroids(emb, "label"))
  }

  test("nearest_centroid ≡ HOF: long cluster ids (the fit-seed path)") {
    GraftFunctions.ensure(spark)
    val rnd = new scala.util.Random(13)
    val emb = Seq.tabulate(120)(i => (i.toLong,
        Array.fill(8)(rnd.nextGaussian())))
      .toDF("vec_id", "embedding")
    val cents = Seq.tabulate(9)(i => (i.toLong * 11,
        Array.fill(8)(rnd.nextGaussian())))
      .toDF("cluster", "cv")
    assignBoth(emb, cents)
  }

  test("nearest_centroid ≡ HOF: null vector, null element, empty vector, " +
      "mismatched-length centroid (null-d2-sorts-first), NaN, null cluster") {
    GraftFunctions.ensure(spark)
    val emb = spark.sql(
      """SELECT * FROM VALUES
           (1L, array(1.0D, 2.0D)),
           (2L, cast(null AS array<double>)),
           (3L, array(1.0D, cast(null AS double))),
           (4L, array()),
           (5L, array(cast('NaN' AS double), 0.0D))
         AS t(vec_id, embedding)""")
    // c9 len-3 (mismatch → null d2, must WIN over every real distance),
    // cNull: null cluster id (wins its tie group), c5 has a NaN dim
    val cents = spark.sql(
      """SELECT * FROM VALUES
           ('c1', array(0.0D, 0.0D)),
           ('c9', array(0.0D, 0.0D, 0.0D)),
           ('c5', array(cast('NaN' AS double), 0.0D)),
           (cast(null AS string), array(9.0D, 9.0D, 9.0D))
         AS t(cluster, cv)""")
    assignBoth(emb, cents)
    // and without any mismatched/null centroids: the NaN-vs-real ordering
    val centsReal = spark.sql(
      """SELECT * FROM VALUES
           ('a', array(0.0D, 0.0D)),
           ('b', array(cast('NaN' AS double), 0.0D))
         AS t(cluster, cv)""")
    assignBoth(emb, centsReal)
  }

  test("property: nearest_centroid ≡ HOF under a seeded adversarial corpus " +
      "(random NaN/Inf/null elements, null vectors, mixed centroid lengths)") {
    GraftFunctions.ensure(spark)
    val rnd = new scala.util.Random(101)
    val dims = 12
    def value(): Double = rnd.nextInt(20) match {
      case 0 => Double.NaN
      case 1 => Double.PositiveInfinity
      case 2 => 0.0
      // coarse grid makes exact d2 ties and 1e-6 rounding collisions
      // likely instead of astronomically rare
      case _ => rnd.nextInt(7) * 1e-6 + rnd.nextInt(3) * 0.25
    }
    val emb = Seq.tabulate(500)(i => (i.toLong, Array.fill(dims)(value())))
      .toDF("vec_id", "raw")
      .withColumn("embedding",
        when(pmod(xxhash64(col("vec_id")), lit(19)) === 0,
          lit(null).cast("array<double>"))
          .otherwise(transform(col("raw"), (x, j) =>
            when(pmod(xxhash64(col("vec_id"), j), lit(23)) === 0,
              lit(null)).otherwise(x))))
    // 24 centroids: a few mismatched lengths (null-d2 path), one null id,
    // values from the same collision-rich grid
    val cents = Seq.tabulate(24) { i =>
      val len = if (i % 11 == 10) dims + 1 else dims
      (if (i == 17) null else f"c$i%02d", Array.fill(len)(value()))
    }.toDF("cluster", "cv")
      .withColumn("cv", transform(col("cv"), (x, j) =>
        when(pmod(xxhash64(col("cluster"), j), lit(29)) === 0,
          lit(null)).otherwise(x)))
    assignBoth(emb, cents)
    assignBoth(emb, cents.orderBy(desc("cluster")))
  }

  test("nearest_centroid ≡ HOF: DUPLICATE cluster ids (fit seeds from a " +
      "dirty corpus) fall to the raw-d2 third sort key on a rounded tie") {
    GraftFunctions.ensure(spark)
    val emb = Seq((1L, Array(0.0))).toDF("vec_id", "embedding")
    // both d2 round to 9.000000 at scale 6 but raw values differ; the
    // LARGER raw comes first in array order, so keeping the incumbent on
    // a (dr, cluster) tie would report the wrong raw d2
    val cents = Seq(
      ("dup", Array(-3.00000007)),
      ("dup", Array(3.00000002))).toDF("cluster", "cv")
    assignBoth(emb, cents)
    assignBoth(emb, cents.orderBy(col("cv")(0)))
  }

  test("nearest_centroid ≡ HOF at d2 ~ 2e10: above 2^33 round6 is the " +
      "identity (ulp/2 > 5e-7), so the rounded compare degenerates to raw") {
    GraftFunctions.ensure(spark)
    val emb = Seq((1L, Array(0.0, 0.0))).toDF("vec_id", "embedding")
    val a = math.sqrt(2e10)
    // d2 values a few ulps (of 2e10) apart, cluster names opposing array
    // order — pins the large-magnitude regime of the fast-reject margin
    // proof (no rounding collisions exist here; winners follow raw d2)
    val cents = (0 to 6).map { i =>
      (f"c${9 - i}", Array(a, math.sqrt(i * 1.9e-6)))
    }.toDF("cluster", "cv")
    assignBoth(emb, cents)
    assignBoth(emb, cents.orderBy(desc("cluster")))
  }

  test("nearest_centroid ≡ HOF: two +Inf distances tie and fall to the " +
      "cluster tie-break (Inf−Inf = NaN must not skip the slow path)") {
    GraftFunctions.ensure(spark)
    val emb = Seq((1L, Array(1.0, 0.0))).toDF("vec_id", "embedding")
    // both centroids give d2 = +Inf; 'z' is FIRST in array order but the
    // tie must resolve to 'a' exactly as the HOF rank-sort does
    val cents = Seq(
      ("z", Array(Double.PositiveInfinity, 0.0)),
      ("a", Array(Double.NegativeInfinity, 0.0))).toDF("cluster", "cv")
    assignBoth(emb, cents)
    assignBoth(emb, cents.orderBy(desc("cluster")))
    assignBoth(emb, cents.orderBy(asc("cluster")))
  }

  test("nearest_centroid ≡ HOF: rounding-tie boundary and fast-reject " +
      "margin (Δd2 of 4.8e-7 / 1.2e-6 / 3e-6 around the incumbent)") {
    GraftFunctions.ensure(spark)
    val emb = Seq((1L, Array(0.0)), (2L, Array(0.5))).toDF("vec_id", "embedding")
    // relative to v=[0.0]: zz d2=1.0; aa d2≈1.00000048 (rounds to the
    // SAME 1e-6 grid point → tie → 'aa' < 'zz' wins); bb ≈ +1.2e-6
    // (rounds above → loses, inside the 2e-6 slow-path window);
    // cc ≈ +3e-6 (fast-rejected without rounding); dd clearly best,
    // placed LAST to force a late replacement of the incumbent
    val cents = Seq(
      ("zz", Array(-1.0)),
      ("aa", Array(-1.00000024)),
      ("bb", Array(-1.0000006)),
      ("cc", Array(-1.0000015)),
      ("dd", Array(0.9))).toDF("cluster", "cv")
    assignBoth(emb, cents)
    // same grid, reversed centroid order (order independence of argmin)
    assignBoth(emb, cents.orderBy(desc("cluster")))
  }
}
