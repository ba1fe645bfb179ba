package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnalyticsQueries, CoreQueries, CurationQueries, DomainQueries, ExtQueries, PipelineQueries, ServingGateQueries, StreamQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2): each entry is a
  * named DataFrame query over the driver corpus at `sfDir`; `oracleSql`
  * carries the equivalent DuckDB SQL for the hash-match correctness gate.
  * Entries without oracle SQL are non-SQL-expressible ops (LSH/minhash/ANN)
  * checked rows-only by the driver.
  */
object SparkEntry {
  private def inventory: Seq[NamedQuery] =
    CoreQueries.all ++ ExtQueries.all ++ DomainQueries.all ++
      PipelineQueries.all ++ StreamQueries.all ++ CurationQueries.all ++
      ServingGateQueries.all ++ AnalyticsQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full Gold pipeline shape of the reference (window dedup → broadcast
    * theta join → case-when classify → project), cf. SURVEY.md §3.2.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("gold_alerts")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    inventory.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    inventory.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
