package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan audits at sf0.001: the properties that decide whether
  * these operators survive a 100 TB scale-up — filter pushdown into the
  * parquet scan, column pruning, broadcast (not shuffled/cartesian) joins,
  * and whole-stage codegen coverage. Failing one of these is a performance
  * regression even while results stay correct.
  */
class PlanQualitySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planString(df: DataFrame): String = {
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p: SparkPlan => p.toString
    }
  }
  private def run(name: String): DataFrame = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // force AQE final plan
    df
  }

  test("q2_filter_project: predicate + projection reach the parquet scan") {
    val plan = run("q2_filter_project").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan)
    assert(!plan.contains("PushedFilters: []"), plan)
    // pruned read schema — lineitem has 11 columns, the scan must not read all
    val read = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
    assert(read.split(",").length < 11, read)
  }

  test("gold_alerts: banded EQUI join — hash/merge on the band key, no nested loop") {
    val plan = planString(run("gold_alerts"))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin") ||
      plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("partition_pruned_scan: segment predicate prunes to one hive partition") {
    val plan = planString(run("partition_pruned_scan"))
    // the read-back scan must carry the partition-key predicate as a
    // PartitionFilter (directory pruning), not a data Filter
    assert("PartitionFilters: \\[[^\\]]*c_mktsegment[^\\]]*BUILDING".r
      .findFirstIn(plan).isDefined, plan)
  }

  test("layout_zorder: pure narrow bit fold — no join, no aggregate exchange") {
    val plan = planString(run("layout_zorder"))
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("HashAggregate"), plan)
  }

  test("q5_local_supplier_volume: small dims broadcast, no cartesian") {
    val plan = planString(run("q5_local_supplier_volume"))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("geo_grid_join: equi join on grid cell, not a cross product") {
    val plan = planString(run("geo_grid_join"))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q1_pricing_summary: partial (map-side) aggregation before the exchange") {
    val plan = planString(run("q1_pricing_summary"))
    // two HashAggregate levels around one exchange = partial + final
    assert(plan.contains("partial_sum"), plan)
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
    // whole-stage codegen spans render as "*(n)" in the executed plan
    assert(plan.contains("*("), plan)
  }

  test("q4_order_topk: global top-k plans as TakeOrderedAndProject, no full sort") {
    val plan = planString(run("q4_order_topk"))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("text_tfidf_topk: df + corpus count broadcast back, no cartesian blowup") {
    val plan = planString(run("text_tfidf_topk"))
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("sample_bernoulli_hash: pure narrow filter — zero shuffles") {
    // the orderBy in the query entry is presentation; the sample itself
    // must not exchange. Audit the operator directly.
    val df = graft.operators.Sampling.hashBernoulli(
      graft.Tables.documents(spark, sf),
      org.apache.spark.sql.functions.col("doc_id"), 0.1)
    df.collect()
    val plan = planString(df)
    assert(!plan.contains("Exchange"), plan)
  }

  test("events_sessionize: one hash exchange serves both windows AND the aggregation") {
    val plan = planString(run("events_sessionize"))
    // lag-window, session-sum-window, and the per-session aggregate all
    // key on user_id; Spark must reuse the single user_id partitioning
    // (the only other exchange is the presentation orderBy's range one)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan)
  }

  test("sim_ann_ivf: cell assignment is narrow — no exchange before the per-cell join") {
    // the argmin over broadcast seeds must be an array expression, not a
    // window: the corpus-side plan up to the probe join may contain only
    // broadcast exchanges (seed array + the equi-join build side), never a
    // hash/range exchange of the corpus itself.
    val plan = planString(run("sim_ann_ivf"))
    // exactly ONE window exec — the final per-query top-k; the two per-side
    // assignment windows of the old formulation are gone ("Window \[" does
    // not match the WindowGroupLimit top-k pushdown nodes)
    assert("Window \\[".r.findAllIn(plan).size === 1, plan)
    val shuffles = "Exchange (hash|range)partitioning".r.findAllIn(plan).toSeq
    // the only allowed shuffles: the final top-k window on query_id and the
    // candidate dropDuplicates — both downstream of the join, keyed small
    assert(shuffles.size <= 3, s"corpus assignment shuffled: $shuffles\n$plan")
  }

  test("graph_pagerank superstep: zero Exchange on the adjacency side; the " +
      "only shuffle is the narrow contribution sum") {
    import org.apache.spark.sql.functions.{col, lit}
    val e0 = graft.Tables.lineitem(spark, sf)
      .select((col("l_suppkey") * 2).as("src"),
              (col("l_partkey") * 2 + 1).as("dst"))
      .distinct()
    val edges = e0.unionByName(
      e0.select(col("dst").as("src"), col("src").as("dst")))
    val adj = graft.operators.Graph.pageRankAdjacency(edges)
    val ranks0 = adj.select(col("src").as("node"),
      lit(graft.operators.Graph.Scale / 100).as("r"))
    val step = graft.operators.Graph.pageRankIterate(adj, ranks0, 1L)
    step.collect() // force AQE final plan
    val plan = planString(step)
    // the packed edge set must never re-shuffle inside the loop: the one
    // hash exchange is the (node, partial-sum) aggregation — if the
    // adjacency (or the rank side, co-partitioned by construction) were
    // exchanged, a second hashpartitioning would appear
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).toSeq
    assert(shuffles.size === 1, s"superstep shuffles: $shuffles\n$plan")
    // and the join must be the shuffled-hash build on the rank side, not a
    // sort-merge that re-sorts the array-laden adjacency stream each pass
    assert(plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("dedup_clusters propagation round: zero Exchange on the edge side; the " +
      "only shuffle is the min-label aggregation") {
    import org.apache.spark.sql.functions.col
    val fwd = graft.Tables.lineitem(spark, sf)
      .select((col("l_suppkey") * 2).as("src"),
              (col("l_partkey") * 2 + 1).as("dst"))
    // same load-time discipline as connectedComponents: symmetrize, pin
    // hash(dst) through the partitioning-preserving barrier
    val edges = graft.plans.PlanBarriers.ckptKeepPartitioning(
      fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
        .repartition(col("dst")))
    val labels = graft.plans.PlanBarriers.ckptKeepPartitioning(
      edges.select(col("dst").as("node")).distinct()
        .withColumn("label", col("node")))
    val round = graft.operators.Clusters.propagateRound(edges, labels)
    round.collect() // force AQE final plan
    val plan = planString(round)
    // the pinned edge set must never re-shuffle inside the loop: the ONE
    // hash exchange is the label-sized min aggregation (the union's label
    // leg re-keys with it — same exchange node under AQE reuse); if the
    // edge stream were exchanged the count would exceed 2
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).toSeq
    assert(shuffles.size <= 2, s"propagation round shuffles: $shuffles\n$plan")
    // and the join must be the shuffled-hash build on the label side, not
    // a sort-merge that re-sorts the edge stream every pass
    assert(plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("bucketed static pin (r12 task 3): the superstep/propagation joins " +
      "stay exchange-free reading the bucketed table, for BOTH operators") {
    import org.apache.spark.sql.functions.{col, lit}
    val e0 = graft.Tables.lineitem(spark, sf)
      .select((col("l_suppkey") * 2).as("src"),
              (col("l_partkey") * 2 + 1).as("dst"))
      .distinct()
    val edges = e0.unionByName(
      e0.select(col("dst").as("src"), col("src").as("dst")))
    // PageRank: force the bucketed pin (threshold 1) and assert the same
    // single-exchange superstep the localCheckpoint variant pins above
    val adj = graft.operators.Graph.pageRankAdjacency(edges,
      bucketedAtEdges = 1L)
    val ranks0 = adj.select(col("src").as("node")).distinct()
      .select(col("node"), lit(graft.operators.Graph.Scale / 100).as("r"))
    val step = graft.operators.Graph.pageRankIterate(adj, ranks0, 1L)
    step.collect()
    val plan = planString(step)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).toSeq
    assert(shuffles.size === 1,
      s"bucketed superstep shuffles: $shuffles\n$plan")
    assert(plan.contains("ShuffledHashJoin") &&
      !plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("SelectedBucketsCount") ||
      plan.contains("Bucketed: true"),
      s"adjacency must come from the bucketed scan\n$plan")
    // connectedComponents: bucketed edge pin, same propagation contract
    val ccEdges = graft.plans.PlanBarriers.pinBucketed(
      edges.select(col("src"), col("dst")).distinct()
        .repartition(col("dst")), "dst")
    val labels = graft.plans.PlanBarriers.ckptKeepPartitioning(
      ccEdges.select(col("dst").as("node")).distinct()
        .withColumn("label", col("node")))
    val round = graft.operators.Clusters.propagateRound(ccEdges, labels)
    round.collect()
    val planCc = planString(round)
    val shufflesCc = "Exchange hashpartitioning".r.findAllIn(planCc).toSeq
    assert(shufflesCc.size <= 2,
      s"bucketed propagation shuffles: $shufflesCc\n$planCc")
    assert(!planCc.contains("SortMergeJoin"), planCc)
  }

  test("q34_rank_family: rn<=15 pushes a map-side WindowGroupLimit; no task " +
      "sorts a full returnflag partition") {
    val plan = planString(run("q34_rank_family"))
    // partial (below the window exchange) + final — each scan task ships
    // only its local top-15 per flag; the full-partition rank family is
    // restated as closed forms of (rn, per-key aggregates), which is what
    // makes this pushdown legal (see the q34 NamedQuery comment)
    assert("WindowGroupLimit".r.findAllIn(plan).size >= 2, plan)
    // only row_number windows — two instances (the third_qty branch
    // re-evaluates the 45-row group-limited window above the reused
    // exchange); percent_rank/cume_dist/nth_value/last must NOT reappear
    // as window functions (they would drag the full partition into one
    // task, the 8.3x/decade shape this rewrite removed)
    assert("Window \\[".r.findAllIn(plan).size <= 2, plan)
    assert(!plan.contains("percent_rank("), plan)
    assert(!plan.contains("cume_dist("), plan)
    assert(!plan.contains("nth_value("), plan)
    // the per-key stats join back as broadcasts, never a shuffle join
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("profile_lineitem: per-column branches, never the multi-distinct Expand") {
    // N count_distinct in ONE aggregation plans through Expand (N x row
    // multiplication before the shuffle) — the 31x regression this guards
    val plan = planString(run("profile_lineitem"))
    assert(!plan.contains("Expand"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("decontaminate: benchmark side broadcasts; corpus is never sort-merge joined") {
    val plan = planString(run("decontaminate"))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("decontaminate_fuzzy: benchmark index broadcasts into the candidate " +
      "join; the corpus is never cartesian- or sort-merge-joined there") {
    val plan = planString(run("decontaminate_fuzzy"))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the candidate join (corpus shingle stream x broadcast bench index)
    // must be the broadcast one; the verify joins re-key only the SMALL
    // candidate set, so any SMJ of the full corpus stream is a regression
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj === 0, plan)
  }

  test("text_repetition: both aggregations keep map-side partials") {
    val plan = planString(run("text_repetition"))
    assert(plan.contains("partial_count") || plan.contains("partial_sum"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("catalog_compact_roundtrip: the committed snapshot is exactly 4 data files") {
    run("catalog_compact_roundtrip")
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_compact_" +
      s"${ProcessHandle.current().pid()}_" +
      sf.replaceAll("[^A-Za-z0-9.]", "_")
    val live = new graft.catalog.TableCatalog(spark, root)
      .livePath("silver", "lineitem_frag").stripPrefix("file:")
    val files = new java.io.File(live).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    // the READ above served from the compacted layout: 64 fragments became 4
    assert(files.length === 4, files.map(_.getName).mkString(","))
  }

  test("pack_sequences: the corpus-wide window is partitioned (two-phase scan)") {
    val df = graft.operators.Packing.packSequences(
      graft.Tables.documents(spark, sf), capacity = 2048)
    df.collect()
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("__pid"), opt)
  }

  test("chunkTokens: pure narrow HOF pipeline — zero shuffles, no join") {
    val df = graft.operators.Chunking.chunkTokens(
      graft.Tables.documents(spark, sf), chunkSize = 16, overlap = 4)
    df.collect()
    val plan = planString(df)
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("changesByKey: one keyed join, never an all-column EXCEPT shuffle or BNLJ") {
    val cat = new graft.catalog.TableCatalog(spark, tmpDir("pq-cdf"))
    val orders = graft.Tables.orders(spark, sf)
      .select(org.apache.spark.sql.functions.col("o_orderkey"),
        org.apache.spark.sql.functions.col("o_totalprice"))
    cat.overwrite(orders.limit(500), "s", "t")
    cat.overwrite(orders.limit(400), "s", "t")
    val df = cat.changesByKey("s", "t", Seq("o_orderkey"), 1, 2)
    df.collect()
    val plan = planString(df)
    assert("SortMergeJoin.*FullOuter".r.findFirstIn(plan).isDefined ||
      "ShuffledHashJoin.*FullOuter".r.findFirstIn(plan).isDefined, plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // exactly one join: the diff never plans per-change-type re-joins
    assert("Join".r.findAllIn(
      plan.replace("SortMergeJoin", "Join")
          .replace("ShuffledHashJoin", "Join")
          .replace("BroadcastHashJoin", "Join")).size === 1, plan)
  }

  test("q28_interval_overlap: grid equi join — no BNLJ, no cartesian, no distinct dedup") {
    val plan = planString(run("q28_interval_overlap"))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // dedup is the overlap-start-bucket filter, never a distinct aggregate
    assert(!plan.toLowerCase.contains("distinct"), plan)
  }

  test("KMV sketch plans as ONE exchange (the bounded-heap aggregate's contract)") {
    // the r8 plan paid a distinct shuffle + a window; the kmv_kmin
    // TypedImperativeAggregate's whole point is map-side reduction to
    // <= k doubles per group before a single exchange — pin it so a
    // refactor can't silently reintroduce the second shuffle
    import graft.operators.Sketches
    val li = Tables.lineitem(spark, sf)
    val sk = Sketches.kmvSketch(li, "l_returnflag", "l_partkey", k = 16)
    sk.collect()
    val plan = planString(sk)
    val exchanges = "Exchange".r.findAllIn(plan).length -
      "BroadcastExchange".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected exactly 1 shuffle exchange:\n$plan")
    assert(plan.contains("kmv_kmin"), plan)
  }

  test("HLL register build plans as ONE exchange (register-array aggregate)") {
    import graft.operators.Sketches
    val li = Tables.lineitem(spark, sf)
    val regs = Sketches.hllRegisters(li, "l_returnflag", "l_partkey")
    regs.collect()
    val plan = planString(regs)
    val exchanges = "Exchange".r.findAllIn(plan).length -
      "BroadcastExchange".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected exactly 1 shuffle exchange:\n$plan")
    assert(plan.contains("hll_regs"), plan)
  }

  test("sketch hashes go through the compiled md5_poly_hash kernel, not HOF lambdas") {
    import graft.operators.Sketches
    val li = Tables.lineitem(spark, sf)
    val plan = planString(Sketches.kmvDistinct(li, "l_returnflag",
      "l_partkey", k = 16))
    assert(plan.contains("md5_poly_hash"), plan)
    assert(!plan.contains("lambdafunction"), plan)
  }

  test("kmeans assignStep: fused nearest_centroid argmin over a broadcast " +
      "centroid array — no HOF sort, no corpus exchange") {
    import graft.operators.KMeans
    val emb = Tables.embeddings(spark, sf)
    val df = KMeans.assignStep(emb, KMeans.labelCentroids(emb, "label"))
    df.collect()
    val plan = planString(df)
    val argminLines = plan.linesIterator
      .filter(_.contains("nearest_centroid")).toSeq
    assert(argminLines.nonEmpty, plan)
    // the replaced formulation's fingerprints: per-row lambda dispatch
    // (incl. the float→double cast transform the kernel absorbed) and an
    // O(k log k) array_sort. labelCentroids' own posexplode lambda is the
    // centroid-AVERAGING side, outside the per-row argmin under test.
    assert(argminLines.forall(!_.contains("lambdafunction")), plan)
    assert(!plan.contains("array_sort"), plan)
    // the 1-row centroid array reaches the corpus by BROADCAST — the
    // corpus itself never shuffles (the only exchanges in the plan are
    // the k-row centroid aggregation's own)
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }
}
