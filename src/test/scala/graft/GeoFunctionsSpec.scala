package graft

import graft.functions.GeoFunctions._
import org.apache.spark.sql.functions._

class GeoFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("euclideanDeg matches the reference formula (gold_batch_job.py:54-57)") {
    val d = Seq((28.29, -16.51, 28.27, -16.64)).toDF("la1", "lo1", "la2", "lo2")
      .select(euclideanDeg($"la1", $"lo1", $"la2", $"lo2").as("d"))
      .head().getDouble(0)
    assert(math.abs(d - math.sqrt(0.02 * 0.02 + 0.13 * 0.13)) < 1e-12)
  }

  test("haversineKm: Madrid→Barcelona ≈ 505 km, symmetric, zero on self") {
    val rows = Seq(
      (40.42, -3.70, 41.39, 2.17),
      (41.39, 2.17, 40.42, -3.70),
      (40.42, -3.70, 40.42, -3.70))
      .toDF("la1", "lo1", "la2", "lo2")
      .select(haversineKm($"la1", $"lo1", $"la2", $"lo2").as("km"))
      .collect().map(_.getDouble(0))
    assert(rows(0) > 495 && rows(0) < 515)
    assert(math.abs(rows(0) - rows(1)) < 1e-9)
    assert(rows(2) === 0.0)
  }

  test("grid cells: points within radius share a neighbor cell (seeded, 1000 pairs)") {
    val rnd = new scala.util.Random(7)
    val cell = 20.0
    val pts = Seq.fill(1000) {
      val (la1, lo1) = (rnd.nextDouble() * 180 - 90, rnd.nextDouble() * 360 - 180)
      // second point within the radius box of the first
      (la1, lo1, la1 + rnd.nextDouble() * 40 - 20, lo1 + rnd.nextDouble() * 40 - 20)
    }
    val df = pts.toDF("la1", "lo1", "la2", "lo2")
      .withColumn("d", euclideanDeg($"la1", $"lo1", $"la2", $"lo2"))
      .filter($"d" < cell)
      .withColumn("c2", gridCell($"la2", $"lo2", cell))
      .withColumn("hit", array_contains(gridCellNeighbors($"la1", $"lo1", cell), $"c2"))
    assert(df.count() > 0)
    assert(df.filter(!$"hit").count() === 0)
  }
}
