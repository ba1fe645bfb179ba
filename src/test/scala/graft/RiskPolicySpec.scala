package graft

import graft.functions.RiskPolicy
import org.apache.spark.sql.functions._

/** 30-30-30 truth table incl. exact boundary semantics (>=30 wind,
  * >=303.15 K, <=30 % — code wins over README; SURVEY.md §7 risk 6) and a
  * seeded property check (more wind never lowers risk), evaluated in one
  * DataFrame pass.
  */
class RiskPolicySpec extends SparkSpec {
  import spark.implicits._

  private def classify(rows: Seq[(String, Double, Double, Double)]): Seq[String] =
    rows.toDF("c", "w", "t", "h")
      .select(RiskPolicy.riskLevel($"c", $"w", $"t", $"h").as("r"))
      .collect().map(_.getString(0)).toSeq

  test("truth table incl. boundaries") {
    val got = classify(Seq(
      ("h", 30.0, 303.15, 30.0),  // all at boundary → EXTREME
      ("h", 30.0, 303.14, 30.0),  // temp just below → VERY_HIGH
      ("h", 30.0, 303.15, 30.01), // humidity just above → VERY_HIGH
      ("h", 29.99, 400.0, 5.0),   // wind just below 30 → HIGH
      ("h", 20.0, 280.0, 90.0),   // wind boundary 20 → HIGH
      ("h", 19.99, 280.0, 90.0),  // → MODERATE
      ("n", 60.0, 400.0, 5.0),    // non-h always LOW
      ("l", 60.0, 400.0, 5.0)))
    assert(got === Seq("EXTREME", "VERY_HIGH", "VERY_HIGH", "HIGH", "HIGH",
      "MODERATE", "LOW", "LOW"))
  }

  test("risk never decreases with wind (seeded property, 500 samples)") {
    val rnd = new scala.util.Random(42)
    val confs = Seq("h", "n", "l")
    val samples = Seq.fill(500) {
      val (w1, w2) = (rnd.nextDouble() * 80, rnd.nextDouble() * 80)
      (confs(rnd.nextInt(3)), math.min(w1, w2), math.max(w1, w2),
        270 + rnd.nextDouble() * 60, rnd.nextDouble() * 100)
    }
    val df = samples.toDF("c", "wlo", "whi", "t", "h").select(
      RiskPolicy.riskRank(RiskPolicy.riskLevel($"c", $"wlo", $"t", $"h")).as("rlo"),
      RiskPolicy.riskRank(RiskPolicy.riskLevel($"c", $"whi", $"t", $"h")).as("rhi"))
    // rank: EXTREME=0 … LOW=4, so more wind ⇒ rank(hi) <= rank(lo)
    assert(df.filter($"rhi" > $"rlo").count() === 0)
  }

  test("riskRank and riskColor cover all levels") {
    val rows = RiskPolicy.levels.toDF("risk_level").select(
      $"risk_level",
      RiskPolicy.riskRank($"risk_level").as("rank"),
      RiskPolicy.riskColor($"risk_level").as("color"))
      .orderBy($"rank")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(rows.map(_._1).toSeq === RiskPolicy.levels)
    assert(rows.map(_._2).toSeq === Seq(0, 1, 2, 3, 4))
    // hex of the reference's get_color RGBA map (app.py:133-138)
    assert(rows.map(_._3).toSeq ===
      Seq("#FF0000", "#FF4500", "#FF8C00", "#FFD700", "#00FF00"))
  }

  test("alertFlags thresholds (weather_producer.py:154-160)") {
    val got = Seq((45.0, 20.0, 40.0), (10.0, 50.0, 20.0), (41.0, 50.0, 20.0))
      .toDF("w", "h", "t")
      .select(RiskPolicy.alertFlags($"w", $"h", $"t").as("f"))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(got === Seq(
      Seq("HIGH_WIND", "LOW_HUMIDITY", "HIGH_TEMP"), Nil, Seq("HIGH_WIND")))
  }
}
