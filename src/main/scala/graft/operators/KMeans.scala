package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — the clustering
  * primitive behind SemDeDup-style semantic deduplication (cluster the
  * corpus, then run exact near-dup detection only WITHIN clusters) and
  * IVF-style partition layouts.
  *
  * Scale design (100 TB): assignment never shuffles the corpus — the k
  * centroids travel as ONE broadcast array row and the argmin is a narrow
  * per-row array expression (the `ivfTopK` seed pattern). Each Lloyd
  * iteration costs exactly one corpus-sized exchange (the posexplode
  * centroid update, with map-side partial aggregation); per-iteration
  * state is k·dims doubles, independent of corpus size, and a
  * `localCheckpoint` barrier per round keeps the plan from growing with
  * the iteration count (the `Clusters.connectedComponents` discipline).
  * Centroids are rounded to 6 decimals each round, so the fit is
  * layout-independent: summation-order noise (~1e-13) cannot flip a later
  * assignment (pinned in KMeansSpec).
  */
object KMeans {

  /** Squared L2 distance as a sequential (deterministic-order) fold. */
  private def l2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, c) => (x - c) * (x - c)),
      lit(0.0), (acc, x) => acc + x)

  /** Per-group centroids in the (cluster, cv) layout `assignStep`
    * consumes: one corpus exchange (posexplode + partial agg), dims
    * rounded to 6 so the table is engine/layout-reproducible — the
    * array-assembled sibling of `Similarity.centroidByGroup`.
    */
  def labelCentroids(emb: DataFrame, groupCol: String,
      vecCol: String = "embedding"): DataFrame =
    emb.select(col(groupCol).as("cluster"),
        posexplode(toDouble(col(vecCol))).as(Seq("dim", "x")))
      .groupBy("cluster", "dim").agg(avg(col("x")).as("m"))
      .groupBy("cluster")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
        s => round(s("m"), 6)).as("cv"))

  /** One Lloyd assignment step: each row gains `cluster` (the nearest
    * centroid's id, ties broken by rounded distance then cluster id —
    * deterministic on any engine) and `d2` (raw squared L2 to it).
    * `centroids` must be (cluster, cv); the corpus never shuffles.
    */
  def assignStep(emb: DataFrame, centroids: DataFrame,
      vecCol: String = "embedding"): DataFrame = {
    graft.plans.GraftFunctions.ensure(emb.sparkSession)
    val centArr = centroids
      .agg(collect_list(struct(col("cluster"), col("cv"))).as("cents"))
    // rank by ROUNDED d2 (order-stable across engines), but report the
    // raw d2 of the winner — both inside the fused `nearest_centroid`
    // argmin kernel (one primitive O(k·dims) loop per row; the HOF
    // formulation it replaced, kept below as `assignStepHof` for the
    // element-for-element equivalence spec, paid k interpreted lambdas
    // plus an O(k log k) struct sort per row and dominated scaled-k fits)
    // the raw vector column goes in un-cast: the kernel reads float OR
    // double elements natively (float→double widening is exact), so the
    // hot path carries zero per-element lambda dispatches
    emb.crossJoin(broadcast(centArr))
      .withColumn("best",
        call_function("nearest_centroid", col(vecCol), col("cents")))
      .withColumn("cluster", col("best")("cluster"))
      .withColumn("d2", col("best")("d2"))
      .drop("best", "cents")
  }

  /** The pre-kernel HOF formulation of `assignStep` — retained ONLY as
    * the semantic reference for VectorExpressionsSpec's equivalence pin
    * (same ranking, null, tie, and raw-d2 reporting contract).
    */
  private[graft] def assignStepHof(emb: DataFrame, centroids: DataFrame,
      vecCol: String = "embedding"): DataFrame = {
    val centArr = centroids
      .agg(collect_list(struct(col("cluster"), col("cv"))).as("cents"))
    val v = toDouble(col(vecCol))
    emb.crossJoin(broadcast(centArr))
      .withColumn("ranked", array_sort(transform(col("cents"), c =>
        struct(round(l2Sq(v, c("cv")), 6).as("dr"),
          c("cluster").as("cluster"), l2Sq(v, c("cv")).as("draw")))))
      .withColumn("cluster", element_at(col("ranked"), 1)("cluster"))
      .withColumn("d2", element_at(col("ranked"), 1)("draw"))
      .drop("ranked", "cents")
  }

  /** Deterministic Lloyd fit: seeds are the k corpus vectors with the
    * smallest xxhash64(id) (the `ivfTopK` convention — reproducible on
    * any cluster, no RNG state), cluster ids are the seed row ids. A
    * cluster that loses all members keeps its previous centroid instead
    * of vanishing, so the output always has exactly k rows.
    */
  def fit(emb: DataFrame, k: Int, maxIter: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(maxIter >= 1, "maxIter must be >= 1")
    val corpus = emb.select(col(idCol).as("id"),
      toDouble(col(vecCol)).as("v"))
    var cent = corpus
      .orderBy(xxhash64(col("id")))
      .limit(k)
      .select(col("id").as("cluster"),
        transform(col("v"), x => round(x, 6)).as("cv"))
      .localCheckpoint(eager = true)
    for (_ <- 1 to maxIter) {
      val assigned = assignStep(corpus, cent, vecCol = "v")
      val next = labelCentroids(
        assigned.select(col("cluster").as("grp"), col("v")), "grp", "v")
        .withColumnRenamed("cv", "cv1")
      cent = cent.select(col("cluster"), col("cv").as("cv0"))
        .join(next, Seq("cluster"), "left")
        .select(col("cluster"), coalesce(col("cv1"), col("cv0")).as("cv"))
        .localCheckpoint(eager = true)
    }
    cent
  }

  /** Fit + final assignment: (idCol, cluster, d2) for every row. */
  def fitAssign(emb: DataFrame, k: Int, maxIter: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    assignStep(emb, fit(emb, k, maxIter, idCol, vecCol), vecCol)
      .select(col(idCol), col("cluster"), col("d2"))

  /** SemDeDup: k-means the corpus, then exact cosine near-dup pairs ONLY
    * within clusters — the all-pairs cost collapses from n² to
    * Σ(cluster size²), which balanced clusters keep near n²/k. The pair
    * stage reuses `Dedup.embeddingCosinePairs` blocked on the learned
    * cluster instead of a metadata label.
    */
  def semanticDedupPairs(emb: DataFrame, k: Int, maxIter: Int,
      threshold: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val assigned = assignStep(emb, fit(emb, k, maxIter, idCol, vecCol), vecCol)
    Dedup.embeddingCosinePairs(assigned, threshold, idCol, vecCol,
      blockCol = Some("cluster"))
  }
}
