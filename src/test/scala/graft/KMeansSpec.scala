package graft

import graft.operators.KMeans
import org.apache.spark.sql.functions._

/** Planted-geometry laws for the Lloyd k-means family: blob recovery,
  * layout independence, the k=1 degenerate point (centroid == global
  * mean), empty-cluster survival, and SemDeDup pair recovery. The
  * assignment KERNEL itself is driver-oracled (cluster_kmeans_assign /
  * dedup_semantic hash-match DuckDB's argmin over rounded label
  * centroids); these laws cover the iterative path the oracle can't.
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  /** Three well-separated 4-dim blobs, 5 points each: blob b centered at
    * 10·(b+1) on every axis, jitter ±0.2 — inter-blob distance dwarfs the
    * jitter. Ids are b·100 + i + 5 ON PURPOSE: `fit` seeds from the k
    * smallest xxhash64(id), and this id scheme puts one seed in each blob
    * (ids 8, 105, 206 — also stable under the 900/902 plant below), so
    * Lloyd recovery of the blob partition is guaranteed, not luck. Blob
    * recovery under ARBITRARY seeding is not a k-means property (two
    * same-blob seeds can split it), so the fixture controls the seeds.
    */
  private def blobs = {
    val rows = for {
      b <- 0 until 3
      i <- 0 until 5
    } yield {
      val base = 10.0f * (b + 1)
      val j = 0.1f * ((b * 5 + i) % 5 - 2)
      (b * 100L + i + 5, Array(base + j, base - j, base + 2 * j, base - 2 * j), b)
    }
    rows.toDF("vec_id", "embedding", "blob")
  }

  test("fit + assign recovers planted blobs as exact partitions") {
    val assigned = KMeans.fitAssign(blobs, k = 3, maxIter = 5)
      .join(blobs.select($"vec_id", $"blob"), "vec_id")
    // every blob maps to exactly one cluster and vice versa
    val mapping = assigned.groupBy($"blob")
      .agg(countDistinct($"cluster").as("nc")).collect()
    assert(mapping.forall(_.getLong(1) === 1L))
    val inverse = assigned.groupBy($"cluster")
      .agg(countDistinct($"blob").as("nb")).collect()
    assert(inverse.length === 3 && inverse.forall(_.getLong(1) === 1L))
  }

  test("fit is layout-independent: same centroids at any partition count") {
    val a = KMeans.fit(blobs, k = 3, maxIter = 4)
      .orderBy($"cluster").collect().map(r =>
        (r.getLong(0), r.getSeq[Double](1).toList))
    val b = KMeans.fit(blobs.repartition(7), k = 3, maxIter = 4)
      .orderBy($"cluster").collect().map(r =>
        (r.getLong(0), r.getSeq[Double](1).toList))
    assert(a.toSeq === b.toSeq)
  }

  test("k=1 converges to the global per-dim mean") {
    val cent = KMeans.fit(blobs, k = 1, maxIter = 2).collect()
    assert(cent.length === 1)
    val got = cent(0).getSeq[Double](1)
    val want = KMeans.labelCentroids(
        blobs.select(lit(0).as("g"), $"embedding"), "g")
      .collect()(0).getSeq[Double](1)
    assert(got === want)
  }

  test("a cluster that loses all members keeps its centroid (k rows out)") {
    // 2 distinct points, k=3: at most 2 clusters can own members; the
    // third must survive on its seed value rather than vanish or NPE.
    val tiny = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(0.0f, 0.0f)),
      (3L, Array(9.0f, 9.0f))).toDF("vec_id", "embedding")
    val cent = KMeans.fit(tiny, k = 3, maxIter = 3).collect()
    assert(cent.length === 3)
    assert(cent.forall(_.getSeq[Double](1).length === 2))
  }

  test("semanticDedupPairs finds the planted near-dup, not distractors") {
    // two near-identical vectors inside blob 0 (cosine ≈ 1), everything
    // else separated; pairs must include the plant and nothing across blobs
    val planted = blobs.union(Seq(
      (900L, Array(20.0f, 20.0f, 20.0f, 20.0f), 1),
      (902L, Array(20.01f, 20.0f, 20.0f, 20.0f), 1)
    ).toDF("vec_id", "embedding", "blob"))
    val pairs = KMeans.semanticDedupPairs(planted, k = 3, maxIter = 4,
        threshold = 0.9999)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((900L, 902L)))
    val blobOf = planted.select($"vec_id", $"blob").as[(Long, Int)]
      .collect().toMap
    assert(pairs.forall { case (a, b) => blobOf(a) === blobOf(b) })
  }
}
