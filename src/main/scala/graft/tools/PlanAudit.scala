package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Inventory-wide physical-plan audit: executes every driver query at a
  * small scale factor and greps the final (AQE) plan for the shapes that
  * kill a 100 TB run — cartesian products, Expand multiplications,
  * single-partition exchanges, nested-loop joins — plus an exchange count
  * as the shuffle budget.
  *
  * Some shapes are INTENDED (rollup/cube are defined by Expand; a global
  * one-row aggregate necessarily ends on one partition; a broadcast theta
  * join or a 1-row broadcast side plans as BNLJ): `PlanAuditSpec` pins the
  * accepted flag set per query with its justification, so any NEW query —
  * or a regression in an old one — that picks up a scale-hostile shape
  * fails the suite instead of shipping.
  *
  * Run standalone: sbt "runMain graft.tools.PlanAudit [sfDir]"
  */
object PlanAudit {

  final case class Audit(name: String, exchanges: Int, flags: Set[String],
      error: Option[String])

  def audit(spark: SparkSession, sfDir: String): Seq[Audit] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.collect()
        val plan = df.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan.toString
          case p => p.toString
        }
        val nExchange = "Exchange (hash|range|Single)".r.findAllIn(plan).size
        val flags = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "Expand" -> plan.contains("Expand"),
          "SinglePartitionExchange" -> plan.contains("Exchange SinglePartition"),
          "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin")
        ).collect { case (f, true) => f }.toSet
        Audit(name, nExchange, flags, None)
      } catch {
        case scala.util.control.NonFatal(e) =>
          Audit(name, -1, Set.empty, Some(e.toString))
      }
    }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      // data-scaled AQE exchange width (BatchScale.aqeWidthConfs scaladoc)
      .config(graft.plans.BatchScale.aqeWidthConfs(sfDir, 8).toMap)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val results = audit(spark, sfDir)
    results.foreach {
      case Audit(n, _, _, Some(err)) => println(f"ERR  $n%-28s ${err.take(80)}")
      case Audit(n, x, fs, None) =>
        val mark = if (fs.nonEmpty) "FLAG" else "ok  "
        println(f"$mark $n%-28s exchanges=$x%-3d ${fs.mkString(",")}")
    }
    println(s"== ${results.size} queries, ${results.count(_.flags.nonEmpty)} flagged ==")
    spark.stop()
  }
}
