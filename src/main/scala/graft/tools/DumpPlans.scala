package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dump `.explain("formatted")` (and, when `exec`, the final AQE plan) for
  * a set of inventory queries into one file per query — the evidence files
  * the optimization rounds commit under plans/rNN/.
  *
  * Usage: runMain graft.tools.DumpPlans <outDir> <suffix> [sfDir] [names]
  *   names: comma-separated; "all" (default) walks the whole inventory.
  * Writes <outDir>/<name>_<suffix>.txt. Queries whose construction already
  * executes (streaming replays, scalar-probe gates) still yield their
  * returned frame's plan; errors land in the file instead of aborting the
  * sweep.
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val names: Seq[String] =
      if (args.length > 3 && args(3) != "all") args(3).split(",").toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val exec = sys.env.getOrElse("SPARK_GRAFT_DUMP_EXEC", "0") == "1"
    Files.createDirectories(outDir)
    graft.streaming.Scratch.install()
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.hadoop.fs.file.impl",
        "graft.streaming.NioLocalFileSystem")
      .config("spark.ui.enabled", "false")
      .config(graft.plans.BatchScale.aqeWidthConfs(sfDir, 32).toMap)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.OracleSidecar.enabled = false
    graft.streaming.ReplaySink.engineOnly = true
    names.foreach { nm =>
      val body =
        try {
          val df = graft.SparkEntry.queries(nm)(spark, sfDir)
          val formatted = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val aqe = if (exec) {
            graft.BenchAction.consume(df)
            "\n=== final AQE plan ===\n" + (df.queryExecution.executedPlan match {
              case a: AdaptiveSparkPlanExec => a.executedPlan.toString
              case p => p.toString
            })
          } else ""
          s"=== $nm @ $sfDir ===\n$formatted$aqe"
        } catch {
          case scala.util.control.NonFatal(e) =>
            s"=== $nm @ $sfDir ===\nERROR: $e"
        } finally {
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(false))
          graft.streaming.ReplaySink.sweep()
          spark.sessionState.catalog.listLocalTempViews("graft_*")
            .foreach(n => spark.catalog.dropTempView(n.table))
        }
      Files.write(outDir.resolve(s"${nm}_$suffix.txt"),
        (body + "\n").getBytes("UTF-8"))
      println(s"[dump] $nm")
    }
    spark.stop()
  }
}
