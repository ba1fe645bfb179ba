package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // STABLE query order (sorted by name): `queries` is a hash Map, so its
    // iteration order reshuffles whenever a key is added — which moved the
    // residual cold-start penalty onto different queries each round and
    // produced three rounds of false >2× regression alarms. Sorted order
    // makes run N comparable to run N-1 query-by-query.
    val inventory = SparkEntry.queries.toSeq.sortBy(_._1)
    // Warm-up pass 1 (sf0.001): JIT/codegen/regex-compile/classloading land
    // here, cheaply. Falls back to the target dir if no sf0.001 sibling.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val warmDir = {
      val w = sfDir.replaceAll("sf[0-9.]+/?$", "sf0.001")
      if (w != sfDir && new java.io.File(w).isDirectory) w else sfDir
    }
    inventory.foreach { case (_, fn) =>
      try { fn(spark, warmDir).count() } catch { case _: Throwable => () }
    }
    // Warm-up pass 2 (TARGET sf, untimed): the sf0.001 pass compiles the
    // code paths but not the target-scale plan family — first execution at
    // the target still pays parquet footer reads, AQE stats, and fresh
    // codegen for stat-dependent plans (measured 3-7× on whichever query
    // ran first). With this pass BOTH timed reps below are fully warm.
    inventory.foreach { case (_, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
    }
    // min of two fully-warm timed runs: single-shot numbers on a shared box
    // swing 2-3× from GC/scheduler noise; the min is the reproducible
    // throughput figure. A failing query must NOT masquerade as a fast
    // success: it reports -1 and the error goes to stderr.
    val results = inventory.map { case (name, fn) =>
      val times = (1 to 2).flatMap { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] $name FAILED: $e"); None
        }
      }
      name -> (if (times.isEmpty) -1.0 else times.min)
    }
    def r3(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum // failed queries excluded
    val fullJson = s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // The driver captures only the LAST ~2000 chars of the run's output and
    // parses a JSON line out of them; the full per-query line is now ~3 KB,
    // so ANY placement of it gets its head cut (BENCH_r02..r04 all have
    // "parsed": null for exactly this reason). Two-line protocol instead:
    //   1. the FULL line goes out first (greppable in complete logs) and to
    //      BENCH_LOCAL.json, which the end-of-round commit snapshots;
    //   2. the LAST line is a COMPACT variant, hard-capped well under the
    //      capture window: same metric/value/unit/sf plus the slowest
    //      queries that fit the budget — the ones a perf reviewer needs.
    println(fullJson)
    val compactJson = {
      val budget = 1500 // bytes for the queries map; window is ~2000 total
      val bySlow = results.sortBy { case (_, v) => -v }
      val picked = scala.collection.mutable.ListBuffer.empty[String]
      var used = 2
      var elided = 0
      bySlow.foreach { case (k, v) =>
        val ent = "\"" + k + "\":" + r3(v)
        if (used + ent.length + 1 <= budget) { picked += ent; used += ent.length + 1 }
        else elided += 1
      }
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":{${picked.mkString(",")}},""" +
        s""""n_queries":${results.size},"elided":$elided,"full":"BENCH_LOCAL.json","sf":"$sfDir"}"""
    }
    try {
      val cwd = java.nio.file.Paths.get("").toAbsolutePath
      val root =
        // exists, not isDirectory: in worktrees/submodules .git is a file
        if (java.nio.file.Files.exists(cwd.resolve(".git"))) cwd
        else {
          val repo = java.nio.file.Paths.get(
            sys.env.getOrElse("SPARK_GRAFT_REPO", "/root/repo"))
          if (java.nio.file.Files.exists(repo.resolve(".git"))) repo else cwd
        }
      java.nio.file.Files.write(root.resolve("BENCH_LOCAL.json"),
        (fullJson + "\n").getBytes("UTF-8"))
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] BENCH_LOCAL.json write failed: $e")
    }
    // the compact line is the FINAL print; logs are silenced first so no
    // shutdown chatter can push it out of the driver's capture window (sbt
    // appends one ~70-char "[success]" line after the JVM exits, which the
    // 500-byte headroom absorbs)
    spark.sparkContext.setLogLevel("OFF")
    println(compactJson)
    System.out.flush()
    spark.stop()
  }
}
