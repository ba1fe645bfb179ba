package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Test-only accessor for the private[sql] surface of
  * SparkSessionExtensions: lets specs verify what an extensions class
  * actually injects without needing a fresh JVM (spark.sql.extensions is a
  * STATIC conf — it cannot apply to a new session on a shared
  * SparkContext, so an in-suite end-to-end check is impossible by design).
  */
object GraftExtensionsProbe {

  def inspect(extClass: SparkSessionExtensions => Unit,
      spark: SparkSession): (Seq[String], Seq[Rule[LogicalPlan]]) = {
    val ext = new SparkSessionExtensions
    extClass(ext)
    val reg = new SimpleFunctionRegistry
    ext.registerFunctions(reg)
    (reg.listFunction().map(_.funcName), ext.buildOptimizerRules(spark))
  }
}
