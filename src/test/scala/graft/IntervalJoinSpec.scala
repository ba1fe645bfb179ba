package graft

import graft.operators.IntervalJoin
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(bucketWidth: Double) = {
    val a = Seq((1L, 0.0, 10.0), (2L, 5.0, 6.0), (3L, 20.0, 25.0))
      .toDF("a_id", "a_start", "a_end")
    val b = Seq((10L, 9.0, 12.0), (11L, 6.0, 7.0), (12L, 30.0, 31.0),
        (13L, 0.0, 40.0))
      .toDF("b_id", "b_start", "b_end")
    IntervalJoin.overlapJoin(a, "a_start", "a_end", b, "b_start", "b_end",
        bucketWidth, maxBucketsPerInterval = 128)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
  }

  // brute-force truth: overlap iff aStart <= bEnd && bStart <= aEnd
  private val truth = Set(
    (1L, 10L), // touching at 10.0/9.0 overlap
    (1L, 11L), // contained
    (1L, 13L), (2L, 13L), (3L, 13L), // b13 spans everything
    (2L, 11L)) // touching endpoints: [5,6] × [6,7] overlap at the point 6

  test("overlap join equals the theta-join truth at several bucket widths") {
    // width sweep: pairs sharing many buckets (0.5), few (8), one (64) —
    // the overlap-start-bucket dedup must yield EXACTLY one row per pair
    for (w <- Seq(0.5, 8.0, 64.0))
      assert(pairs(w) === truth, s"bucketWidth=$w")
  }

  test("no duplicate rows for pairs spanning many shared buckets") {
    val a = Seq((1L, 0.0, 50.0)).toDF("a_id", "a_start", "a_end")
    val b = Seq((2L, 10.0, 45.0)).toDF("b_id", "b_start", "b_end")
    val got = IntervalJoin.overlapJoin(a, "a_start", "a_end",
      b, "b_start", "b_end", bucketWidth = 1.0)
    assert(got.count() === 1) // 35 shared buckets, exactly one output row
  }

  test("negative coordinates bucket correctly (floor, not truncate)") {
    val a = Seq((1L, -10.0, -8.0)).toDF("a_id", "a_start", "a_end")
    val b = Seq((2L, -9.0, -7.0), (3L, -7.5, -6.0)).toDF("b_id", "b_start", "b_end")
    val got = IntervalJoin.overlapJoin(a, "a_start", "a_end",
      b, "b_start", "b_end", bucketWidth = 4.0)
      .select($"b_id").as[Long].collect().toSet
    assert(got === Set(2L)) // [-10,-8] × [-7.5,-6] do NOT overlap
  }

  test("maxPairsPerBucket: pairs starting in over-cap buckets drop; the rest stay exact") {
    val a = Seq((1L, 0.0, 5.0), (2L, 1.0, 6.0), (3L, 2.0, 25.0), (4L, 20.0, 26.0))
      .toDF("a_id", "a_start", "a_end")
    val b = Seq((10L, 0.0, 9.0), (11L, 3.0, 8.0), (12L, 4.0, 30.0), (13L, 21.0, 27.0))
      .toDF("b_id", "b_start", "b_end")
    def run(cap: Option[Long]) =
      IntervalJoin.overlapJoin(a, "a_start", "a_end", b, "b_start", "b_end",
        bucketWidth = 10.0, maxPairsPerBucket = cap)
        .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    val truth = Set((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (2L, 11L),
      (2L, 12L), (3L, 10L), (3L, 11L), (3L, 12L), (3L, 13L), (4L, 12L),
      (4L, 13L))
    assert(run(None) === truth)
    // bucket 0 carries 3 left × 3 right rows = 9 > 8 → skipped: every pair
    // whose overlap STARTS in [0,10) vanishes — including a3's, even though
    // a3 also lives in surviving buckets — while pairs starting in bucket 2
    // (a3×b13, a4×b12, a4×b13) survive exactly.
    assert(run(Some(8L)) === Set((3L, 13L), (4L, 12L), (4L, 13L)))
    assert(run(Some(9L)) === truth) // cap not exceeded anywhere → exact
  }

  test("an interval spanning more than maxBucketsPerInterval fails loudly") {
    val a = Seq((1L, 0.0, 1000.0)).toDF("a_id", "a_start", "a_end")
    val b = Seq((2L, 1.0, 2.0)).toDF("b_id", "b_start", "b_end")
    val ex = intercept[Exception] {
      IntervalJoin.overlapJoin(a, "a_start", "a_end",
        b, "b_start", "b_end", bucketWidth = 1.0, maxBucketsPerInterval = 64)
        .count()
    }
    assert(ex.getMessage != null)
  }
}
