package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  // a small symmetrized star: hub 0 <-> leaves 1..6
  private def starEdges = {
    val one = (1L to 6L).map(i => (0L, i)).toDF("src", "dst")
    one.unionByName(one.select(col("dst").as("src"), col("src").as("dst")))
  }

  test("hub of a star outranks every leaf; leaves tie exactly") {
    val out = Graph.pageRankFixedPoint(starEdges, 7L, iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hub = out(0L)
    val leaves = (1L to 6L).map(out)
    assert(leaves.toSet.size === 1, "symmetric leaves must tie bit-exactly")
    assert(hub > leaves.head * 3,
      s"hub rank $hub should dominate leaf rank ${leaves.head}")
  }

  test("fixed-point ranks are partition-layout independent") {
    val e = starEdges
    val a = Graph.pageRankFixedPoint(e.repartition(1), 7L, 5)
      .orderBy("node").collect().toSeq
    val b = Graph.pageRankFixedPoint(e.repartition(13), 7L, 5)
      .orderBy("node").collect().toSeq
    assert(a === b, "integer arithmetic must be layout-invariant")
  }

  test("total rank mass stays within deterministic floor-rounding drift") {
    // each node loses < outdeg ulps to the two integer divisions per
    // iteration; total drift over 5 iterations is bounded by
    // 5 * (|edges| + |nodes|) ulps — microscopic against Scale
    val out = Graph.pageRankFixedPoint(starEdges, 7L, 5)
      .agg(sum("rank_fp")).head().getLong(0)
    val drift = Graph.Scale - out
    assert(drift >= 0, "floor rounding can only lose mass")
    assert(drift < 5L * (12 + 7) * 100, s"drift $drift implausibly large")
  }
}
