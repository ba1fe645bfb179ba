package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial + domain column library for the wildfire-risk pipeline.
  * Pure-`Column` expressions (no UDFs) so every use stays inside
  * whole-stage codegen and pushes through Catalyst.
  */
object GeoFunctions {

  /** Euclidean distance in degrees — the reference's distance metric
    * (reference: gold_batch_job.py:54-57). Kept verbatim (including its
    * geodesic naivety) for result parity.
    */
  def euclideanDeg(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    sqrt(pow(lat1 - lat2, 2) + pow(lon1 - lon2, 2))

  /** Great-circle Haversine distance in km — the capability the reference
    * advertises but never implements (reference: README.MD:281).
    * R = 6371.0088 km (IUGG mean earth radius).
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2 * 6371.0088) * asin(least(lit(1.0), sqrt(a)))
  }

  /** Kelvin → Celsius (reference: app.py:118). */
  def kToC(k: Column): Column = k - lit(273.15)

  /** Geohash-style spatial bucket key for co-partitioned distance joins at
    * scale: floor lat/lon to a `cellDeg` grid. Two points within `radius`
    * degrees always fall in the same or neighboring cells when
    * cellDeg >= radius, so a cell-equi join + distance filter replaces the
    * cross join (SURVEY.md §7 risk 5 — the 100 TB scaling lever).
    */
  def gridCell(lat: Column, lon: Column, cellDeg: Double): Column =
    concat_ws(":",
      floor(lat / lit(cellDeg)).cast("long"),
      floor(lon / lit(cellDeg)).cast("long"))

  /** All 9 neighbor cells of a point's cell — explode to join against
    * `gridCell` of the other side.
    */
  def gridCellNeighbors(lat: Column, lon: Column, cellDeg: Double): Column = {
    val cy = floor(lat / lit(cellDeg)).cast("long")
    val cx = floor(lon / lit(cellDeg)).cast("long")
    array((for (dy <- -1 to 1; dx <- -1 to 1) yield
      concat_ws(":", cy + lit(dy), cx + lit(dx))): _*)
  }
}

/** The "30-30-30" fire-risk classification rule, exactly as coded (not as
  * README'd — code wins; reference: gold_batch_job.py:63-74): boundaries
  * are `>= 30`, `>= 303.15` K, `<= 30` %, and any non-"h" confidence is
  * LOW regardless of weather. Wind is km/h, temperature is KELVIN at the
  * threshold even though the producer emits °C — quirk preserved
  * (SURVEY.md §7 risks 6-7).
  */
object RiskPolicy {
  val levels: Seq[String] = Seq("EXTREME", "VERY_HIGH", "HIGH", "MODERATE", "LOW")

  def riskLevel(confidence: Column, windSpeed: Column, tempK: Column,
      humidity: Column): Column =
    when(confidence === "h" && windSpeed >= 30.0 && tempK >= 303.15 &&
         humidity <= 30.0, "EXTREME")
      .when(confidence === "h" && windSpeed >= 30.0, "VERY_HIGH")
      .when(confidence === "h" && windSpeed >= 20.0, "HIGH")
      .when(confidence === "h", "MODERATE")
      .otherwise("LOW")

  /** Dashboard severity ordinal, EXTREME=0 … LOW=4 (reference: app.py:63-64)
    * — expressed as a when-chain, not a UDF.
    */
  def riskRank(riskLevel: Column): Column =
    levels.zipWithIndex.foldLeft(lit(4)) { case (acc, (l, i)) =>
      when(riskLevel === l, i).otherwise(acc)
    }

  /** Map-marker color as hex of the reference's RGBA map (get_color,
    * app.py:133-138: EXTREME [255,0,0], VERY_HIGH [255,69,0], HIGH
    * [255,140,0], MODERATE [255,215,0], else [0,255,0]) — when-chain, not
    * a UDF.
    */
  def riskColor(riskLevel: Column): Column =
    when(riskLevel === "EXTREME", "#FF0000")
      .when(riskLevel === "VERY_HIGH", "#FF4500")
      .when(riskLevel === "HIGH", "#FF8C00")
      .when(riskLevel === "MODERATE", "#FFD700")
      .otherwise("#00FF00")

  /** Producer-side threshold warning flags
    * (reference: weather_producer.py:154-160).
    */
  def alertFlags(windSpeed: Column, humidity: Column, temperatureC: Column): Column =
    array_compact(array(
      when(windSpeed > 40.0, "HIGH_WIND"),
      when(humidity < 30.0, "LOW_HUMIDITY"),
      when(temperatureC > 35.0, "HIGH_TEMP")))
}
