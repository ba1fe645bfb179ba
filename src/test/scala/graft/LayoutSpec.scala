package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Z-order layout: Morton interleave correctness and the locality payoff
  * (an aligned 2D quadrant lands in few partitions after clustering).
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue interleaves bits (x -> even positions, y -> odd)") {
    val got = Seq((5L, 3L), (0L, 0L), (7L, 0L), (0L, 7L))
      .toDF("x", "y")
      .select(Layout.zvalue($"x", $"y", bits = 3).as("z"))
      .as[Long].collect().toSeq
    // morton(5,3): x=101 -> bits 4,2,0 = 10001 (17); y=011 -> bits 3,1 = 1010 (10)
    assert(got === Seq(27L, 0L, 21L, 42L))
  }

  test("zorderBy: rows preserved; an aligned quadrant concentrates in few partitions") {
    val grid = (for (x <- 0 until 32; y <- 0 until 32)
      yield (x, y)).toDF("x", "y")
    val z = Layout.zorderBy(grid, $"x", $"y", numFiles = 16, bits = 5)
      .withColumn("pid", spark_partition_id())
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getInt(2)))
    // lossless rewrite
    assert(z.map(_._1).toSet.size === 32 * 32)
    // the [0,7]x[0,7] quadrant is 1/16 of the space = one z-contiguous run:
    // it must touch at most 2 of the 16 range partitions (boundary split)
    val quadrant = z.filter { case ((x, y), _) => x < 8 && y < 8 }
    assert(quadrant.map(_._2).toSet.size <= 2,
      s"quadrant spread over ${quadrant.map(_._2).toSet}")
    // a same-sized RANDOM row sample would spread over ~all partitions;
    // the x-stripe [0,7] x [0,31] (same row count, z-fragmented) must
    // still beat nothing, but the aligned quadrant must beat the stripe
    val stripe = z.filter { case ((x, _), _) => x < 8 }
    assert(quadrant.map(_._2).toSet.size < stripe.map(_._2).toSet.size)
  }
}
