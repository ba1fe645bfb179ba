package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Pins the harness-trust contract from BASELINE.md "Bench-pruning
  * artifact": the bench's consumer must be structurally non-prunable.
  * Both halves are asserted on the SAME known-prunable shape (a global
  * aggregate whose value feeds nothing downstream):
  *
  *  1. under `.count()`, Catalyst drops the aggregate from the executed
  *     plan — the exact mechanism that made `approx_distinct_hll` read
  *     0.20s for two rounds while really costing ~4s;
  *  2. under `BenchAction.consume` (noop write), the aggregate survives
  *     into the executed plan, because a write requires every output
  *     column of every row.
  *
  * If (1) ever starts failing — a future Spark stops pruning — the bench
  * is still honest; if (2) ever fails, the bench is lying again and this
  * spec is the alarm.
  */
class BenchActionSpec extends SparkSpec {

  /** Parquet-backed input: the bench queries all read parquet, and a
    * LocalRelation would defeat the test another way (ConvertToLocal-
    * Relation pre-evaluates projections driver-side, erasing the marker
    * from the plan without any pruning being involved).
    */
  private lazy val src: DataFrame = {
    import spark.implicits._
    val dir = tmpDir("bench-action") + "/t"
    (1L to 1000L).toDF("id").write.parquet(dir)
    spark.read.parquet(dir)
  }

  /** A global aggregate over a marker expression: prunable under count()
    * (the output row count is 1 regardless of the aggregate's value).
    * xxhash64 is the marker — greppable in plan strings, never introduced
    * by the optimizer on its own.
    */
  private def prunableShape: DataFrame =
    // avg, not sum: summing 1000 xxhash64 longs overflows under ANSI mode
    // (which itself proves the aggregate runs under the consumer — the
    // count() path never threw, because it never computed it)
    src.agg(avg(xxhash64(col("id"))).as("sig"))

  /** Run `action` and return the executed-plan strings of every query
    * execution it triggered (listener-captured; the bus is flushed before
    * returning).
    */
  private def executedPlans(action: => Unit): Seq[String] = {
    val plans = ArrayBuffer.empty[String]
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        plans.synchronized { plans += qe.executedPlan.toString }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      action
      // the execution listener bus is async and has no public flush; poll
      // until the capture count is non-zero AND stable for 300 ms
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var last = -1
      var stableSince = System.nanoTime()
      while (System.nanoTime() < deadline &&
          (plans.synchronized(plans.size) == 0 ||
            System.nanoTime() - stableSince < 300L * 1000 * 1000)) {
        val n = plans.synchronized(plans.size)
        if (n != last) { last = n; stableSince = System.nanoTime() }
        Thread.sleep(20)
      }
    } finally spark.listenerManager.unregister(listener)
    plans.synchronized(plans.toSeq)
  }

  test("count() prunes a global aggregate (the bug class; documents why " +
      "count is banned as the bench action)") {
    val plans = executedPlans { prunableShape.count(): Unit }
    assert(plans.nonEmpty, "listener captured no query execution")
    assert(!plans.exists(_.contains("xxhash64")),
      s"expected count() to prune the aggregate, but the executed plan " +
        s"still computes it:\n${plans.mkString("\n---\n")}")
  }

  test("BenchAction.consume keeps the aggregate in the executed plan") {
    val plans = executedPlans { BenchAction.consume(prunableShape) }
    assert(plans.nonEmpty, "listener captured no query execution")
    assert(plans.exists(_.contains("xxhash64")),
      s"noop-write consumer must compute the full output; captured " +
        s"plans:\n${plans.mkString("\n---\n")}")
  }

  test("BenchAction.consume computes every output column (column pruning " +
      "cannot bite)") {
    // a projection whose second column is the marker; count() would prune
    // it (no column needed to count rows), the consumer must not
    val df = src.select(col("id"), xxhash64(col("id")).as("h"))
    val countPlans = executedPlans { df.count(): Unit }
    val consumePlans = executedPlans { BenchAction.consume(df) }
    assert(!countPlans.exists(_.contains("xxhash64")),
      "count() unexpectedly computed the unused column")
    assert(consumePlans.exists(_.contains("xxhash64")),
      s"consumer dropped an output column:\n${consumePlans.mkString("\n---\n")}")
  }
}
