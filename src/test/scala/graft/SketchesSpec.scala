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

  // ---------------------------------------------------------------------
  // Streaming merge laws THROUGH THE STATE STORE (VERDICT r9 task 8): the
  // batch merge-law tests above exercise kmvMerge/hllMerge directly; the
  // streaming gates exercise ONE arrival order under the default provider.
  // These property cases pin the full algebra end-to-end: ScalaCheck
  // generates a skewed corpus, the SAME rows arrive as different
  // micro-batch splits and orders (associativity + commutativity of the
  // TypedImperativeAggregate's serialized-buffer merge inside the state
  // store), and every replay must equal the one-shot batch sketch — under
  // BOTH providers, HDFS-backed (default) and RocksDB (the 100 TB one).
  // ---------------------------------------------------------------------

  private def underProvider[A](provider: Option[String])(body: => A): A =
    provider match {
      case None => body
      case Some(cls) =>
        val key = "spark.sql.streaming.stateStore.providerClass"
        val clKey = "spark.sql.streaming.stateStore.rocksdb." +
          "changelogCheckpointing.enabled"
        val prev = spark.conf.getOption(key)
        val prevCl = spark.conf.getOption(clKey)
        spark.conf.set(key, cls)
        spark.conf.set(clKey, "true")
        try body finally {
          prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
          prevCl.fold(spark.conf.unset(clKey))(spark.conf.set(clKey, _))
        }
    }

  private val rocksdb = Some("org.apache.spark.sql.execution.streaming." +
    "state.RocksDBStateStoreProvider")

  /** Replay `batches` through a complete-mode streaming run of `agg`,
    * post-process the final sink table with `finish` (identity for
    * single-agg sketches; the register→estimate step for HLL, which — as
    * in the production gate — runs batch-side because chaining two
    * stateful aggregates trips the global-watermark correctness check),
    * and return the result canonicalized.
    */
  private def replay(batches: Seq[Seq[(String, Long)]])(
      agg: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      finish: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame
        = identity): Seq[String] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val sink = "prop_sketch_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = agg(mem.toDF.toDF("g", "k"))
      .writeStream.format("memory").queryName(sink)
      .outputMode("complete").start()
    try batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    val out = finish(spark.table(sink)).orderBy("g")
      .collect().toSeq.map(_.toString)
    spark.sql(s"DROP TABLE IF EXISTS $sink")
    out
  }

  test("property: streaming KMV and HLL are micro-batch split/order " +
      "invariant under default AND RocksDB state stores") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // seeded skewed corpus: 3 groups, heavy duplication, long-tail keys
    val rows = Gen.listOfN(3000, for {
      g <- Gen.frequency((5, Gen.const("a")), (2, Gen.const("b")),
        (1, Gen.const("c")))
      k <- Gen.frequency((3, Gen.choose(1L, 40L)), (1, Gen.choose(1L, 5000L)))
    } yield (g, k)).apply(Gen.Parameters.default, Seed(1007L)).get

    def kmv(df: org.apache.spark.sql.DataFrame) =
      Sketches.kmvDistinct(df, "g", "k", k = 64)
    def hllRegs(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegisters(df, "g", "k")
    def hllFinish(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllEstimate(df, "g")

    // ground truth: the one-shot batch sketch of the whole corpus
    val batchKmv = kmv(rows.toDF("g", "k")).orderBy("g")
      .collect().toSeq.map(_.toString)
    val batchHll = hllFinish(hllRegs(rows.toDF("g", "k"))).orderBy("g")
      .collect().toSeq.map(_.toString)

    // ScalaCheck-driven replays: random split points and batch orders.
    // Identity split (1 batch), random 2/3/5-way splits, reversed and
    // rotated orders — merge(a,b)=merge(b,a) and ((a·b)·c)=(a·(b·c))
    // through state-store serialize/deserialize.
    val splits: Seq[Seq[Seq[(String, Long)]]] = {
      def cut(parts: Int, seed: Long): Seq[Seq[(String, Long)]] = {
        val cuts = Gen.listOfN(parts - 1, Gen.choose(1, rows.size - 1))
          .apply(Gen.Parameters.default, Seed(seed)).get
          .distinct.sorted
        val bounds = (0 +: cuts :+ rows.size).distinct.sorted
        bounds.zip(bounds.tail).map { case (a, b) => rows.slice(a, b) }
      }
      Seq(
        Seq(rows),              // single batch
        cut(2, 11L),            // 2-way
        cut(3, 23L),            // 3-way
        cut(5, 37L),            // 5-way
        cut(3, 23L).reverse,    // commutativity: same parts, reversed
        { val p = cut(5, 37L); p.drop(2) ++ p.take(2) }) // rotation
    }

    for (provider <- Seq(None, rocksdb)) underProvider(provider) {
      splits.foreach { batches =>
        val gotKmv = replay(batches)(kmv)
        assert(gotKmv === batchKmv,
          s"KMV diverged (provider=$provider, ${batches.size} batches)")
        val gotHll = replay(batches)(hllRegs, hllFinish)
        assert(gotHll === batchHll,
          s"HLL diverged (provider=$provider, ${batches.size} batches)")
      }
    }
  }
}
