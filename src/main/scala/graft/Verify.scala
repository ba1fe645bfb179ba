package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // Optional 3rd arg: comma-separated query-name filter for fast local
    // iteration (the driver always calls with 2 args → full inventory).
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, Option.empty[Set[String]])
      case Array(s, o, f) => (s, o, Some(f.split(",").toSet))
    }
    // Key the oracle-sidecar tables as a SIBLING of this run's output dir
    // (absolute — DuckDB resolves the glob from an unknown cwd) and pin
    // the SF actually being verified. Sibling, not child: the driver's
    // comparator globs every entry INSIDE outDir as a query result, so a
    // sidecar placed within it shows up as a junk non-query entry in the
    // round's correctness file (the r7 `_oracle_mat` err row). Per-run
    // keying also kills the fixed-global-path clobber window between
    // concurrent runs and makes the oracle gate SF-portable (sweeps at
    // sf0.001/sf0.1 read their own sidecars, not a stale sf0.01 one).
    OracleSidecar.root =
      Paths.get(outDir).toAbsolutePath.toString + "_oracle_mat"
    OracleSidecar.sf = new java.io.File(sfDir).getName
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // RAM-backed scratch for replay staging/checkpoints (graft.streaming.Scratch)
    graft.streaming.Scratch.install()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.fs.file.impl",
        "graft.streaming.NioLocalFileSystem")
      .config("spark.ui.enabled", "false")
      // data-scaled AQE exchange width (BatchScale.aqeWidthConfs scaladoc)
      .config(graft.plans.BatchScale.aqeWidthConfs(sfDir, cpus.toInt).toMap)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val selected = only match {
      case Some(names) => SparkEntry.queries.view.filterKeys(names).toMap
      case None        => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // resolveSql at WRITE time: sidecar paths in the SQL are placeholders
    // until here, so nothing depends on SparkEntry-vs-main init order
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(OracleSidecar.resolveSql(v))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
