package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Print one named inventory query's physical plan — formatted (pre-exec)
  * and the final AQE plan after a run: `runMain graft.tools.ExplainOne
  * <name> [sfDir]`. The per-query companion of PlanAudit's inventory grep.
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.OracleSidecar.enabled = false
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    println("=== formatted (pre-exec) ===")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    df.collect()
    println("=== final AQE plan ===")
    println(df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    })
    spark.stop()
  }
}
