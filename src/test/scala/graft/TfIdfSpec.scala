package graft

import graft.operators.TfIdf
import org.apache.spark.sql.functions._

/** The two df-join strategies of TfIdf.topTerms must be result-identical:
  * broadcastVocab=true (default; dictionary fits executors) vs false (the
  * 100 TB open-vocabulary escape that keeps the df join on the shuffle).
  */
class TfIdfSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("broadcast and shuffle vocab paths produce identical top-k") {
    val docs = Tables.documents(spark, sf)
    val a = TfIdf.topTerms(docs, k = 3)
      .orderBy(col("doc_id"), col("rank")).collect()
    val b = TfIdf.topTerms(docs, k = 3, broadcastVocab = false)
      .orderBy(col("doc_id"), col("rank")).collect()
    assert(a.nonEmpty)
    assert(a.toSeq === b.toSeq)
  }

  test("shuffle path really does avoid the vocabulary broadcast") {
    val docs = Tables.documents(spark, sf)
    // with AQE a small df side may still end up broadcast at runtime; the
    // contract to pin is the STATIC plan: no planner-forced broadcast hint
    val optimized = TfIdf.topTerms(docs, k = 3, broadcastVocab = false)
      .queryExecution.optimizedPlan.toString
    assert(!optimized.contains("ResolvedHint"), optimized)
    val hinted = TfIdf.topTerms(docs, k = 3)
      .queryExecution.analyzed.toString
    assert(hinted.contains("UnresolvedHint") || hinted.contains("ResolvedHint"),
      hinted)
  }
}
