package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def mkDf(n: Int, grp: String) =
    (1 to n).map(i => (grp, i.toLong)).toDF("g", "k")

  test("KMV: exact below k, estimator within sampling error at or above k") {
    val small = mkDf(10, "small")   // 10 distinct < k
    val big = mkDf(5000, "big")     // 5000 distinct >> k
    val out = Sketches.kmvDistinct(small.unionByName(big), "g", "k", k = 64)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(out("small") === ((10L, 10.0))) // sketch IS the set: exact
    val (sz, est) = out("big")
    assert(sz === 64L)
    // k=64 → RSE ≈ 1/sqrt(k−2) ≈ 12.7%; 4σ bound keeps flake ~1e-4
    assert(est > 2500 && est < 7500, s"estimate $est implausible for 5000")
  }

  test("KMV merge law: union-of-sketches re-cut == sketch of the union") {
    val df = (1 to 4000).map(i => ("g" + (i % 3), (i * 7).toLong))
      .toDF("g", "k")
    val k = 32
    val whole = Sketches.kmvEstimate(Sketches.kmvSketch(df, "g", "k", k), "g", k)
      .orderBy("g").collect().toSeq
    val h1 = Sketches.kmvSketch(df.filter(col("k") % 2 === 0), "g", "k", k)
    val h2 = Sketches.kmvSketch(df.filter(col("k") % 2 =!= 0), "g", "k", k)
    val merged = Sketches.kmvEstimate(Sketches.kmvMerge(h1, h2, "g", k), "g", k)
      .orderBy("g").collect().toSeq
    assert(merged === whole)
    // commutativity
    val merged2 = Sketches.kmvEstimate(Sketches.kmvMerge(h2, h1, "g", k), "g", k)
      .orderBy("g").collect().toSeq
    assert(merged2 === whole)
  }

  test("KMV is partition-layout independent") {
    val df = (1 to 2000).map(i => ("g", i.toLong)).toDF("g", "k")
    val a = Sketches.kmvDistinct(df.repartition(1), "g", "k", 64).collect()
    val b = Sketches.kmvDistinct(df.repartition(13), "g", "k", 64).collect()
    assert(a.toSeq === b.toSeq)
  }
}
