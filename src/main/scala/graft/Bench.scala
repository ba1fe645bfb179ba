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
    // Warm-up: run the whole inventory once at the smallest scale factor so
    // JIT/codegen/parquet-footer/regex-compile costs land here, not on
    // whichever query happens to be timed first — the timed pass below then
    // measures steady-state throughput (the 100 TB-relevant number). Falls
    // back to the target dir if no sf0.001 sibling exists.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val warmDir = {
      val w = sfDir.replaceAll("sf[0-9.]+/?$", "sf0.001")
      if (w != sfDir && new java.io.File(w).isDirectory) w else sfDir
    }
    SparkEntry.queries.foreach { case (_, fn) =>
      try { fn(spark, warmDir).count() } catch { case _: Throwable => () }
    }
    // min of two timed runs: single-shot numbers on a shared box swing 2-3×
    // from GC/scheduler noise; the min is the reproducible throughput figure.
    // A failing query must NOT masquerade as a fast success: it reports -1
    // (excluded from nothing — the consumer sees the negative marker) and
    // the error goes to stderr.
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to 2).flatMap { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] $name FAILED: $e"); None
        }
      }
      name -> (if (times.isEmpty) -1.0 else times.min)
    }
    // 3-decimal rounding keeps the JSON line short (log-tail capture
    // truncated round 2's full-precision line and lost 8 entries), and ms
    // precision is below the run-to-run noise floor anyway.
    def r3(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum // failed queries excluded
    val json = s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // the JSON line goes out IMMEDIATELY after timing — before the file
    // write, before spark.stop() — and everything after it is silenced
    // (log level OFF below): round 3 lost one query entry because Spark's
    // shutdown logging FOLLOWED the line in the driver's combined capture
    // and ran the fixed-size tail window past the line's head.
    println(json)
    System.out.flush()
    // belt and braces vs log truncation: the same line goes to a repo file
    // the driver snapshots with the end-of-round commit. Anchor on the
    // repo root when identifiable (cwd may differ under a launcher); a
    // failed write warns instead of silently losing the fallback copy.
    try {
      val cwd = java.nio.file.Paths.get("").toAbsolutePath
      val root =
        // exists, not isDirectory: in worktrees/submodules .git is a file
        if (java.nio.file.Files.exists(cwd.resolve(".git"))) cwd
        else {
          // fallback (overridable) only when it is actually a git
          // checkout — never dump the file into an unrelated directory
          val repo = java.nio.file.Paths.get(
            sys.env.getOrElse("SPARK_GRAFT_REPO", "/root/repo"))
          if (java.nio.file.Files.exists(repo.resolve(".git"))) repo else cwd
        }
      java.nio.file.Files.write(root.resolve("BENCH_LOCAL.json"),
        (json + "\n").getBytes("UTF-8"))
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] BENCH_LOCAL.json write failed: $e")
    }
    // nothing may print after the JSON line: shutdown logs would re-fill
    // the capture tail that the line must survive in
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
  }
}
