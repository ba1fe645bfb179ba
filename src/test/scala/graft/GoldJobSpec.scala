package graft

import graft.gold.GoldJob
import graft.model.Fixtures
import graft.serving.ServingQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden-result test of the full Gold pipeline on the reference's own mock
  * fixtures (4 fires × 32 stations with fresh+stale readings), plus
  * equivalence of the broadcast and grid-bucketed join strategies.
  */
class GoldJobSpec extends SparkSpec {
  import spark.implicits._

  private def fires = Fixtures.mockFires.toDS().toDF()
  private def weather = Fixtures.mockWeather.toDS().toDF()

  test("latestWeather keeps exactly the fresh reading per station") {
    val lw = GoldJob.latestWeather(weather)
    assert(lw.count() === 32)
    // stale rows have wind_speed=1.0; none may survive
    assert(lw.filter($"wind_speed" === 1.0).count() === 0)
  }

  test("goldAlerts: distance bound, schema, risk assignment") {
    val gold = GoldJob.goldAlerts(fires, weather)
    val rows = gold.collect()
    assert(rows.nonEmpty)
    assert(gold.columns.toSeq === Seq("timestamp", "fire_lat", "fire_lon",
      "weather_station", "wind_speed", "temperature", "humidity",
      "risk_level", "distance_deg"))
    assert(rows.forall(_.getAs[Double]("distance_deg") < GoldJob.radiusDeg))
    // non-h fires are always LOW (SURVEY §7 risk 7)
    val nonH = Set(28.60, 40.41) // lat of the "l" and "n" mock fires
    assert(rows.filter(r => nonH(r.getAs[Double]("fire_lat")))
      .forall(_.getAs[String]("risk_level") == "LOW"))
    // mock temperatures are °C (15..35) — never ≥303.15, so no EXTREME/VERY_HIGH
    // unless wind ≥30 with confidence h: those must be VERY_HIGH, not EXTREME
    assert(rows.forall(_.getAs[String]("risk_level") != "EXTREME"))
  }

  test("grid-bucketed join ≡ broadcast theta join") {
    def canon(df: DataFrame) = df
      .orderBy($"fire_lat", $"fire_lon", $"weather_station")
      .collect().toSeq
    assert(canon(GoldJob.goldAlertsGrid(fires, weather)) ===
      canon(GoldJob.goldAlerts(fires, weather)))
  }

  test("maxPairsPerCell skips dense cells, keeps sparse cells exact") {
    // cell (0,0): 2 fires × 2 stations = 4 pair-cost; far cell: 1 × 1.
    // cap 3 → the dense cell's alerts vanish, the sparse cell's survive
    // untouched; cap ≥ 4 (and the None default) → exact everywhere.
    val f = Seq((1L, 0.3, 0.3, "h"), (2L, 0.4, 0.4, "h"),
        (3L, 50.2, 120.2, "h"))
      .toDF("timestamp", "lat", "lon", "confidence")
    val w = Seq(
        (101L, 1L, 0.1, 0.1, 10.0, 50.0, 20.0),
        (102L, 1L, 0.2, 0.2, 10.0, 50.0, 20.0),
        (103L, 1L, 50.1, 120.1, 10.0, 50.0, 20.0))
      .toDF("location_id", "timestamp", "lat", "lon", "wind_speed",
        "humidity", "temperature")
    assert(GoldJob.goldAlertsGrid(f, w).count() === 5)
    assert(GoldJob.goldAlertsGrid(f, w, maxPairsPerCell = Some(100L)).count() === 5)
    val capped = GoldJob.goldAlertsGrid(f, w, maxPairsPerCell = Some(3L))
      .select($"fire_lat", $"weather_station").as[(Double, Long)].collect()
    assert(capped.toSet === Set((50.2, 103L)))
  }

  test("runCycle default is density-capped: bounded pair output plus the " +
      "certificate table; exact form stays explicit") {
    import graft.catalog.TableCatalog
    val cat = new TableCatalog(spark, tmpDir("gold-cycle"))
    // same fixture as the cap test above: origin cell dense under cap=3,
    // the (50.x, 120.x) cell sparse
    val f = Seq((1L, 0.3, 0.3, "h"), (2L, 0.4, 0.4, "h"),
        (3L, 50.2, 120.2, "h"))
      .toDF("timestamp", "lat", "lon", "confidence")
    val w = Seq(
        (101L, 1L, 0.1, 0.1, 10.0, 50.0, 20.0),
        (102L, 1L, 0.2, 0.2, 10.0, 50.0, 20.0),
        (103L, 1L, 50.1, 120.1, 10.0, 50.0, 20.0))
      .toDF("location_id", "timestamp", "lat", "lon", "wind_speed",
        "humidity", "temperature")
    cat.overwrite(f, "silver", "fire_events")
    cat.overwrite(w, "silver", "weather_events")
    // capped cycle: the dense origin cell is CULLED from pair emission
    // (bounded output) and served through the certificate table instead
    assert(GoldJob.runCycle(cat, Some(3L)))
    val alerts = cat.read("gold", "fire_risk_alerts")
    assert(alerts.select($"fire_lat", $"weather_station")
      .as[(Double, Long)].collect().toSet === Set((50.2, 103L)))
    val cells = cat.read("gold", "fire_risk_alert_cells")
    assert(cells.filter($"is_dense" === 1).count() === 1,
      "culled dense cell must surface as a certificate row")
    assert(cells.filter($"is_dense" === 0).count() >= 1,
      "sparse cells carry their exact summary in the same table")
    // DEFAULT cycle: cap present (1M — nothing dense at this scale), both
    // tables written, full exact pair set at this density
    assert(GoldJob.runCycle(cat))
    assert(cat.read("gold", "fire_risk_alerts").count() === 5)
    assert(cat.read("gold", "fire_risk_alert_cells")
      .filter($"is_dense" === 1).count() === 0)
    // the EXACT cycle is its own verb — uncapped flagship semantics, and
    // it REFRESHES the cells summary (cap=∞ → nothing dense) so the two
    // gold tables can never disagree about which cells were culled
    assert(GoldJob.runCycleExact(cat))
    assert(cat.read("gold", "fire_risk_alerts").count() === 5)
    assert(cat.read("gold", "fire_risk_alert_cells")
      .filter($"is_dense" === 1).count() === 0,
      "exact cycle left a stale dense certificate behind")
  }

  test("serving queries over gold") {
    val gold = GoldJob.goldAlerts(fires, weather).cache()
    val uf = ServingQueries.uniqueFires(gold)
    // one best alert per distinct fire coordinate
    assert(uf.count() ===
      gold.select($"fire_lat", $"fire_lon").distinct().count())
    val k = ServingQueries.kpis(uf).head()
    assert(k.getAs[Long]("n_fires") === uf.count())
    val dist = ServingQueries.riskDistribution(gold)
    assert(dist.agg(sum($"count")).head().getLong(0) === gold.count())
    assert(ServingQueries.topWind(uf, 3).count() <= 3)
    val lvls = ServingQueries.distinctLevels(gold).as[String].collect().toSet
    assert(ServingQueries.filterByLevels(gold, lvls.toSeq).count() === gold.count())
    gold.unpersist()
  }
}
