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

  test("CMS one-sided error: est >= exact for every key, exact at large w") {
    // zipf-ish: key i appears (200/i) times
    val rows = (1 to 50).flatMap(i => Seq.fill(200 / i)(i.toLong)).toDF("k")
    val d = 4; val w = 512
    val sketch = Sketches.cmsSketch(rows, "k", d, w)
    val exact = rows.groupBy(col("k")).agg(count(lit(1)).as("n"))
    val joined = Sketches.cmsEstimate(sketch, exact, "k", d, w)
      .join(exact, "k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(joined.nonEmpty)
    joined.foreach { case (k, est, n) =>
      assert(est >= n, s"CMS undercounted key $k: est=$est exact=$n")
    }
    // 50 distinct keys across 4x512 cells: collisions are improbable
    // enough that the min over 4 rows is exact here
    joined.foreach { case (k, est, n) =>
      assert(est === n, s"key $k: est=$est != exact=$n at sparse load")
    }
  }

  test("CMS merge law: cell-wise sum of shard grids == grid of the union") {
    val rows = (1 to 3000).map(i => (i % 97).toLong).toDF("k")
    val d = 4; val w = 64
    val whole = Sketches.cmsSketch(rows, "k", d, w)
      .orderBy("__i", "__bucket").collect().toSeq
    val s1 = Sketches.cmsSketch(rows.filter(col("k") < 40), "k", d, w)
    val s2 = Sketches.cmsSketch(rows.filter(col("k") >= 40), "k", d, w)
    val merged = Sketches.cmsMerge(s1, s2)
      .orderBy("__i", "__bucket").collect().toSeq
    assert(merged.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))) ===
      whole.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))))
  }

  test("HLL: estimate within the m=256 error envelope, duplicate-insensitive") {
    val rows = (1 to 5000).map(i => ("g", (i % 2000).toLong)).toDF("g", "k")
    val out = Sketches.hllDistinct(rows, "g", "k").collect().head
    val est = out.getAs[Double]("est_distinct")
    // RSE ≈ 1.04/sqrt(256) ≈ 6.5%; 4σ keeps flake negligible
    assert(est > 2000 * 0.74 && est < 2000 * 1.26,
      s"estimate $est implausible for 2000 distinct")
    // duplicates never move a register (max absorbs them)
    val dup = Sketches.hllDistinct(
      rows.unionByName(rows), "g", "k").collect().head
    assert(dup.getAs[Double]("est_distinct") === est)
  }

  test("HLL small-range correction engages and is near-exact at tiny n") {
    val rows = (1 to 20).map(i => ("g", i.toLong)).toDF("g", "k")
    val out = Sketches.hllDistinct(rows, "g", "k").collect().head
    assert(out.getAs[Long]("zeros") >= 236) // ≥ 256 − 20 empty registers
    val est = out.getAs[Double]("est_distinct")
    assert(est > 15 && est < 25, s"linear-counting estimate $est for n=20")
  }

  test("HLL merge law: register-wise max of shards == registers of the union") {
    val rows = (1 to 4000).map(i => ("g" + (i % 3), (i * 13).toLong))
      .toDF("g", "k")
    val whole = Sketches.hllEstimate(
      Sketches.hllRegisters(rows, "g", "k"), "g")
      .orderBy("g").collect().toSeq
    val h1 = Sketches.hllRegisters(rows.filter(col("k") % 2 === 0), "g", "k")
    val h2 = Sketches.hllRegisters(rows.filter(col("k") % 2 =!= 0), "g", "k")
    val merged = Sketches.hllEstimate(
      Sketches.hllMerge(h1, h2, "g"), "g").orderBy("g").collect().toSeq
    assert(merged === whole)
    // idempotence: merging a shard with itself changes nothing
    val self = Sketches.hllEstimate(
      Sketches.hllMerge(h1, h1, "g"), "g").orderBy("g").collect().toSeq
    val alone = Sketches.hllEstimate(h1, "g").orderBy("g").collect().toSeq
    assert(self === alone)
  }
}
