package graft

import graft.operators.Clusters
import org.apache.spark.sql.functions._

/** Connected-components cluster resolution over near-dup pairs. */
class ClustersSpec extends SparkSpec {
  import spark.implicits._

  test("components: chain, triangle, and singletons-by-absence") {
    // chain 1-2-3-4, triangle 10-11-12 (+ redundant edge), pair 20-21
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("doc1", "doc2")
    val got = Clusters.connectedComponents(pairs, "doc1", "doc2")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("long chain converges past one propagation round (distributed path)") {
    // path graph 0-1-2-...-40: diameter 40, min label must ripple end to
    // end; driverFallbackEdges = 0 forces the distributed loop
    val pairs = (0L until 40L).map(i => (i, i + 1)).toDF("doc1", "doc2")
    val got = Clusters.connectedComponents(pairs, "doc1", "doc2",
        maxIter = 50, driverFallbackEdges = 0L)
      .as[(Long, Long)].collect()
    assert(got.length === 41 && got.forall(_._2 === 0L))
  }

  test("driver union-find and distributed loop agree on a random graph") {
    val rnd = new scala.util.Random(23)
    val pairs = (0 until 300)
      .map(_ => (rnd.nextInt(150).toLong, rnd.nextInt(150).toLong))
      .filter(p => p._1 != p._2)
      .toDF("doc1", "doc2")
    val fast = Clusters.connectedComponents(pairs, "doc1", "doc2")
      .as[(Long, Long)].collect().toMap
    val dist = Clusters.connectedComponents(pairs, "doc1", "doc2",
        maxIter = 50, driverFallbackEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(fast === dist)
  }

  test("bucketed edge pin agrees with the checkpoint pin on a random graph") {
    val rnd = new scala.util.Random(29)
    val pairs = (0 until 300)
      .map(_ => (rnd.nextInt(150).toLong, rnd.nextInt(150).toLong))
      .filter(p => p._1 != p._2)
      .toDF("doc1", "doc2")
    val ckpt = Clusters.connectedComponents(pairs, "doc1", "doc2",
        maxIter = 50, driverFallbackEdges = 0L)
      .as[(Long, Long)].collect().toMap
    val bucketed = Clusters.connectedComponents(pairs, "doc1", "doc2",
        maxIter = 50, driverFallbackEdges = 0L, bucketedAtEdges = 1L)
      .as[(Long, Long)].collect().toMap
    assert(ckpt === bucketed, "pin currency must never change a cluster")
    // the checkpoint-free hint path (web-scale callers: the edge set is
    // too big to localCheckpoint at all — the measured sf10 shape)
    val hinted = Clusters.connectedComponents(pairs, "doc1", "doc2",
        maxIter = 50, driverFallbackEdges = 0L, bucketedAtEdges = 1L,
        edgeCountHint = Some(Long.MaxValue))
      .as[(Long, Long)].collect().toMap
    assert(ckpt === hinted, "the hint path must never change a cluster")
  }

  test("large-star/small-star agrees with union-find on chains, blobs, and a random graph") {
    // deep path (the min-label loop's worst case), a dense blob, a pair
    val adversarial = ((0L until 64L).map(i => (i, i + 1)) ++
      Seq((200L, 201L), (200L, 202L), (201L, 202L), (202L, 203L)) ++
      Seq((900L, 901L))).toDF("doc1", "doc2")
    // driverFallbackEdges = 0 forces the DISTRIBUTED star loop; the
    // default exercises the counted union-find fallback — both must agree
    // with connectedComponents everywhere
    val star = Clusters.connectedComponentsStar(adversarial, "doc1", "doc2",
        driverFallbackEdges = 0L)
      .as[(Long, Long)].collect().toMap
    val starFb = Clusters.connectedComponentsStar(adversarial, "doc1", "doc2")
      .as[(Long, Long)].collect().toMap
    val exact = Clusters.connectedComponents(adversarial, "doc1", "doc2")
      .as[(Long, Long)].collect().toMap
    assert(star === exact)
    assert(starFb === exact)
    // random graph, both orientations and dupes included
    val rnd = new scala.util.Random(7)
    val pairs = (1 to 300).map { _ =>
      (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong)
    }.filter(p => p._1 != p._2).toDF("doc1", "doc2")
    val starR = Clusters.connectedComponentsStar(pairs, "doc1", "doc2",
        driverFallbackEdges = 0L)
      .as[(Long, Long)].collect().toMap
    val starRFb = Clusters.connectedComponentsStar(pairs, "doc1", "doc2")
      .as[(Long, Long)].collect().toMap
    val exactR = Clusters.connectedComponents(pairs, "doc1", "doc2")
      .as[(Long, Long)].collect().toMap
    assert(starR === exactR)
    assert(starRFb === exactR)
    // a self-loop-only node is still a (singleton) node on all paths
    val selfLoop = Seq((50L, 50L), (60L, 61L)).toDF("doc1", "doc2")
    val s1 = Clusters.connectedComponentsStar(selfLoop, "doc1", "doc2")
      .as[(Long, Long)].collect().toMap
    val s1d = Clusters.connectedComponentsStar(selfLoop, "doc1", "doc2",
        driverFallbackEdges = 0L)
      .as[(Long, Long)].collect().toMap
    val s2 = Clusters.connectedComponents(selfLoop, "doc1", "doc2")
      .as[(Long, Long)].collect().toMap
    assert(s1 === Map(50L -> 50L, 60L -> 60L, 61L -> 60L))
    assert(s1 === s2)
    assert(s1d === s2)
  }

  test("keepList drops all but one representative per cluster") {
    val docs = (1L to 8L).map(i => (i, s"text$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc1", "doc2")
    val kept = Clusters.keepList(docs, pairs, "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(1L, 4L, 5L, 7L, 8L))
  }

  test("keepListBy keeps the max-rank member per cluster, ties broken by min id") {
    import org.apache.spark.sql.functions.col
    // quality: doc 3 best in {1,2,3}; 5 and 6 tie in {5,6} → min id 5 wins
    val docs = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 1L),
                   (5L, 7L), (6L, 7L), (7L, 1L), (8L, 1L))
      .toDF("doc_id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc1", "doc2")
    val kept = Clusters.keepListBy(docs, pairs, "doc_id", col("quality"))
      .select("doc_id").as[Long].collect().sorted
    // singletons 4, 7, 8 always survive
    assert(kept === Array(3L, 4L, 5L, 7L, 8L))
  }
}
