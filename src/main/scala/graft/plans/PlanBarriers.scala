package graft.plans

import org.apache.spark.sql.DataFrame

/** Lineage barriers that KEEP physical properties. */
object PlanBarriers {

  /** Eager localCheckpoint that preserves the plan's hash partitioning.
    * `Dataset.checkpoint` copies the executed plan's outputPartitioning
    * into the `LogicalRDD` — but only when that plan isn't an
    * `AdaptiveSparkPlanExec`, which reports UnknownPartitioning (and
    * whose coalesced final shuffle wouldn't match `shuffle.partitions`
    * anyway). A checkpoint built under AQE therefore FORGETS it is
    * hash(key) and every consumer re-exchanges it — measured by
    * `graft.tools.CkptProbe`: 3 exchanges per PageRank superstep under
    * AQE-built checkpoints, 1 with this barrier. AQE is toggled off just
    * for the materialization (eager, so the conf is restored
    * immediately) and restored in finally; downstream queries keep their
    * own AQE setting. This is the Pregel load-time discipline for every
    * iterative operator whose STATIC side must stay put: partition once,
    * exchange only the small per-round state.
    *
    * The toggle + materialize run under a per-session lock: the conf is
    * session-global, so two unsynchronized callers could interleave —
    * the second reading "false" as the old value and restoring it,
    * leaving AQE silently disabled session-wide. The lock serializes the
    * read-modify-restore; the window where an UNRELATED concurrent query
    * plans without AQE remains (the conf is one value per session), but
    * it is now bounded by one materialization and always restores the
    * true prior value.
    */
  def ckptKeepPartitioning(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.synchronized {
      val key = "spark.sql.adaptive.enabled"
      val old = spark.conf.get(key, "true")
      spark.conf.set(key, "false")
      try df.localCheckpoint(true) finally spark.conf.set(key, old)
    }
  }
}
