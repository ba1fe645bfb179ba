package graft

import graft.catalog.TableCatalog
import graft.operators.Layout
import org.apache.spark.sql.functions._

/** File-stats data skipping (TableCatalog `statsCols` / `readRange`): the
  * Delta/Iceberg-style min/max sidecar must (1) describe every data file,
  * (2) stay invisible to normal reads, (3) prune the scheduled file set —
  * not just filter rows — while returning exactly the plain filter's
  * result, and (4) treat all-null stats conservatively. `inputFiles` is
  * the witness for what the scan actually planned.
  */
class DataSkippingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("sidecar: one row per data file, min<=max, invisible to read()") {
    val cat = new TableCatalog(spark, tmpDir("skipcat"))
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity")
    cat.overwrite(li.repartition(8), "silver", "li",
      statsCols = Seq("l_orderkey"))
    val stats = cat.fileStats("silver", "li").get.collect()
    assert(stats.length == 8, s"8 files expected, ${stats.length} stat rows")
    stats.foreach { r =>
      assert(r.getLong(r.fieldIndex("min_l_orderkey")) <=
        r.getLong(r.fieldIndex("max_l_orderkey")))
    }
    assert(cat.read("silver", "li").count() == li.count())
    assert(cat.read("silver", "li").columns.toSet ==
      Set("l_orderkey", "l_partkey", "l_quantity"))
  }

  test("readRange == plain filter, and schedules fewer files when zordered") {
    val cat = new TableCatalog(spark, tmpDir("skipcat"))
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    cat.overwrite(
      Layout.zorderBy(li, col("l_orderkey"), col("l_partkey"), numFiles = 8),
      "silver", "liz", statsCols = Seq("l_orderkey", "l_partkey"))
    val got = cat.readRange("silver", "liz",
      Seq(("l_orderkey", 100L, 300L), ("l_partkey", 0L, 60L)))
    val want = cat.read("silver", "liz")
      .filter(col("l_orderkey").between(100, 300) &&
        col("l_partkey").between(0, 60))
    assert(want.count() > 0, "test range must be non-empty to mean anything")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    val scheduled = got.inputFiles.length
    assert(scheduled < 8, s"expected file pruning, scheduled $scheduled/8")
  }

  test("disjoint range: empty result, table schema, zero files scheduled") {
    val cat = new TableCatalog(spark, tmpDir("skipcat"))
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey")
    cat.overwrite(li.repartition(4), "silver", "li",
      statsCols = Seq("l_orderkey"))
    val got = cat.readRange("silver", "li",
      Seq(("l_orderkey", -100L, -50L)))
    assert(got.inputFiles.isEmpty, "no file's [min,max] intersects < 0")
    assert(got.count() == 0)
    assert(got.schema == cat.read("silver", "li").schema)
  }

  test("all-null stats keep the file; hive partition columns survive") {
    import spark.implicits._
    val df = ((1 to 10).map(i => (i.toLong, "a")) ++
      (1 to 5).map(_ => (0L, "b")))
      .toDF("v", "p")
      .withColumn("v", when(col("p") === "b", lit(null)).otherwise(col("v")))
    val cat = new TableCatalog(spark, tmpDir("skipcat"))
    cat.overwrite(df.repartition(1), "silver", "t",
      partitionBy = Seq("p"), statsCols = Seq("v"))
    val got = cat.readRange("silver", "t", Seq(("v", 5L, 7L)))
    // the all-null p=b file is KEPT by pruning (conservative) but its rows
    // fail the residual predicate; the partition column must round-trip
    assert(got.columns.contains("p"))
    assert(got.select("v").as[Long].collect().sorted.toSeq == Seq(5L, 6L, 7L))
    assert(got.select("p").distinct().as[String].collect().toSeq == Seq("a"))
  }

  test("rollup: >64 files plan file-count-sublinearly; null group conservative") {
    import spark.implicits._
    val cat = new TableCatalog(spark, tmpDir("skipcat"))
    // ~130 range-disjoint data files + one all-null-stats file (isolated
    // deterministically in its own hive partition): three rollup groups
    // (64/64/rest), the null file sorted into the LAST group
    val df = ((1 to 130).map(i => (Option(i.toLong), i, "d")) :+
      ((None: Option[Long]), 999, "n"))
      .toDF("k", "payload", "side")
    cat.overwrite(df.repartitionByRange(130, col("k")), "silver", "wide",
      partitionBy = Seq("side"), statsCols = Seq("k"))
    val nFiles = cat.fileStats("silver", "wide").get.count()
    val roll = cat.statsRollup("silver", "wide").get.collect()
    assert(roll.length == ((nFiles + 63) / 64).toInt,
      s"one rollup row per 64 files, got ${roll.length} for $nFiles")
    assert(roll.count(_.getBoolean(roll.head.fieldIndex("null_k"))) == 1,
      "exactly one group carries the all-null-stats file")
    // [100,110] lives entirely in the middle group; the first group's
    // envelope misses it (group pruning), the last group survives ONLY via
    // its null flag (its non-null envelope is 129..130) and contributes
    // just the conservative null file at the per-file level
    val got = cat.readRange("silver", "wide", Seq(("k", 100L, 110L)))
    assert(got.select("k").as[Long].collect().sorted.toSeq ==
      (100L to 110L))
    val scheduled = got.inputFiles.length
    assert(scheduled <= 13,
      s"11 matching + the null file expected, scheduled $scheduled")
    // dropping the rollup must not change semantics (pre-rollup fallback)
    val live = new org.apache.hadoop.fs.Path(
      cat.livePath("silver", "wide"), "_stats_rollup")
    live.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(live, true)
    val got2 = cat.readRange("silver", "wide", Seq(("k", 100L, 110L)))
    assert(got2.select("k").as[Long].collect().sorted.toSeq ==
      (100L to 110L))
  }

  test("pre-r15 sidecar (no __rel/__grp, no rollup) prunes via the listing") {
    import spark.implicits._
    val cat = new TableCatalog(spark, tmpDir("skipcat"))
    val df = (1L to 400L).toDF("k").withColumn("v", col("k") * 3.0)
    cat.overwrite(df.repartitionByRange(8, col("k")), "silver", "old",
      statsCols = Seq("k"))
    // rewrite the sidecar to the r14 shape: per-file min/max only
    val statsPath = new org.apache.hadoop.fs.Path(
      cat.livePath("silver", "old"), "_stats")
    val rollPath = new org.apache.hadoop.fs.Path(
      cat.livePath("silver", "old"), "_stats_rollup")
    val fs = statsPath.getFileSystem(spark.sessionState.newHadoopConf())
    val legacy = cat.fileStats("silver", "old").get
      .drop("__rel", "__grp").collect()
    val legacySchema = cat.fileStats("silver", "old").get
      .drop("__rel", "__grp").schema
    fs.delete(statsPath, true)
    fs.delete(rollPath, true)
    spark.createDataFrame(
      spark.sparkContext.parallelize(legacy.toIndexedSeq), legacySchema)
      .coalesce(1).write.parquet(statsPath.toString)
    val got = cat.readRange("silver", "old", Seq(("k", 101L, 150L)))
    assert(got.select("k").as[Long].collect().sorted.toSeq ==
      (101L to 150L))
    assert(got.inputFiles.length < 8, "listing fallback must still prune")
  }
}
