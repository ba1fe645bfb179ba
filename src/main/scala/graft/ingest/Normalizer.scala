package graft.ingest

import graft.model.{FireEvent, Schemas, WeatherEvent}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Batch ingestion normalizers: raw source shapes (FIRMS CSV, OpenWeather
  * JSON) → canonical typed events, replacing the reference's producer-side
  * Python (reference: nasa_producer.py:74-94,192-200,
  * weather_producer.py:94-114,217-233) with engine-side declarative ops so
  * backfills run distributed.
  */
object Normalizer {

  /** Required-column validation (reference: nasa_producer.py:81-84):
    * fail fast with the missing set, before any job is launched.
    */
  def requireColumns(df: DataFrame, required: Seq[String]): DataFrame = {
    val missing = required.filterNot(df.columns.contains)
    require(missing.isEmpty, s"missing required columns: ${missing.mkString(", ")}")
    df
  }

  /** FIRMS-shaped CSV (header row; columns latitude, longitude,
    * bright_ti4, confidence, ...) → FireEvent
    * (reference: nasa_producer.py:74-94,192-200).
    */
  def firesFromCsv(spark: SparkSession, path: String, region: String): Dataset[FireEvent] = {
    import spark.implicits._
    val raw = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    requireColumns(raw, Seq("latitude", "longitude", "bright_ti4", "confidence",
      "acq_date", "acq_time"))
      .select(
        lit("NASA_VIIRS").as("source"),
        lit(region).as("region"),
        col("latitude").cast("double").as("lat"),
        col("longitude").cast("double").as("lon"),
        col("bright_ti4").cast("double").as("temp_k"),
        col("confidence").cast("string").as("confidence"),
        // FIRMS acq times are UTC: an explicit +0000 offset in the pattern
        // pins the parse regardless of session time zone (a zone-less
        // unix_timestamp would shift the same CSV hours per deployment)
        (unix_timestamp(
          concat_ws(" ", col("acq_date"),
            format_string("%04d", col("acq_time")), lit("+0000")),
          "yyyy-MM-dd HHmm XX")
          .cast("double")).as("timestamp"))
      .as[FireEvent]
  }

  /** Multi-region fan-out + concat (reference: nasa_producer.py:119-141):
    * per-region frames unioned by name — list-extend ≡ unionByName.
    */
  def firesFromCsvRegions(spark: SparkSession, paths: Map[String, String]): Dataset[FireEvent] =
    paths.map { case (region, path) => firesFromCsv(spark, path, region) }
      .reduce(_ unionByName _)

  /** OpenWeather-shaped JSON lines (nested main/wind structs) → WeatherEvent
    * (reference: weather_producer.py:94-114,217-233). Producer extras
    * (zone, pressure, clouds, weather_main ...) are dropped by projection —
    * schema-on-read, same as the reference's Silver parse.
    */
  def weatherFromJson(spark: SparkSession, path: String): Dataset[WeatherEvent] = {
    import spark.implicits._
    val raw = spark.read.json(path)
    requireColumns(raw, Seq("name", "coord", "main", "wind", "dt"))
      .select(
        lit("OpenWeather").as("source"),
        col("name").as("location_id"),
        col("coord.lat").cast("double").as("lat"),
        col("coord.lon").cast("double").as("lon"),
        col("wind.speed").cast("double").as("wind_speed"),
        col("wind.deg").cast("double").as("wind_deg"),
        col("main.humidity").cast("double").as("humidity"),
        col("main.temp").cast("double").as("temperature"),
        col("dt").cast("double").as("timestamp"))
      .as[WeatherEvent]
  }

  /** Kafka-wire JSON payload (one object per line/value) → canonical events
    * via `from_json` against the explicit schema, flattened with `data.*` —
    * the Silver parse (S2; reference: fire_risk_processor.py:56-57).
    * Malformed rows parse to nulls, preserved (schema-on-read).
    */
  def parseFireJson(raw: DataFrame, valueCol: String = "value"): DataFrame =
    raw.select(from_json(col(valueCol).cast("string"), Schemas.fire).as("data"))
      .select("data.*")

  def parseWeatherJson(raw: DataFrame, valueCol: String = "value"): DataFrame =
    raw.select(from_json(col(valueCol).cast("string"), Schemas.weather).as("data"))
      .select("data.*")
}
