package graft.model

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.types.StructType

/** Canonical event/table model of the wildfire-risk lakehouse, re-derived
  * from the reference's Silver stream schemas
  * (reference: src/processing/fire_risk_processor.py:25-45) as typed case
  * classes. `Dataset[FireEvent]`/`Dataset[WeatherEvent]` give the typed
  * surface; the `schema` values are the exact `StructType`s used for
  * `from_json` schema-on-read projection (producer extras are dropped by
  * parse, reference: weather_producer.py:217-233).
  *
  * Event time is Unix epoch SECONDS as Double at the wire
  * (reference: nasa_producer.py:199) — kept as Double in the model for
  * oracle-equal ordering, upgraded to TimestampType by the streaming layer
  * for watermarking (SURVEY.md §7 risk 3).
  */
final case class FireEvent(
    source: String,
    region: String,
    lat: Double,
    lon: Double,
    temp_k: Double,
    confidence: String,
    timestamp: Double)

final case class WeatherEvent(
    source: String,
    location_id: String,
    lat: Double,
    lon: Double,
    wind_speed: Double,
    wind_deg: Double,
    humidity: Double,
    temperature: Double,
    timestamp: Double)

/** Gold output row (reference: gold_batch_job.py:75-78). */
final case class RiskAlert(
    timestamp: Double,
    fire_lat: Double,
    fire_lon: Double,
    weather_station: String,
    wind_speed: Double,
    temperature: Double,
    humidity: Double,
    risk_level: String,
    distance_deg: Double)

/** Weather-station dimension row (reference: weather_producer.py:18-57). */
final case class Station(name: String, lat: Double, lon: Double, region: String)

object Schemas {
  val fire: StructType = Encoders.product[FireEvent].schema
  val weather: StructType = Encoders.product[WeatherEvent].schema
  val alert: StructType = Encoders.product[RiskAlert].schema
}

/** Deterministic fixtures lifted from the reference's mock generators —
  * these double as golden-test inputs (SURVEY.md §5).
  */
object Fixtures {

  /** The 4 mock fire detections (reference: nasa_producer.py:39-44). */
  val mockFires: Seq[FireEvent] = Seq(
    FireEvent("NASA_VIIRS", "canarias", 28.29, -16.51, 350.0, "h", 1700000000.0),
    FireEvent("NASA_VIIRS", "canarias", 28.60, -17.85, 320.0, "l", 1700000000.0),
    FireEvent("NASA_VIIRS", "peninsula", 40.41, -3.70, 310.0, "n", 1700000000.0),
    FireEvent("NASA_VIIRS", "peninsula", 37.38, -5.99, 305.0, "h", 1700000000.0))

  /** The 32-station dimension (8 canarias + 24 peninsula), abbreviated
    * coordinates (reference: weather_producer.py:18-57).
    */
  val stations: Seq[Station] = Seq(
    Station("Teide_National_Park", 28.27, -16.64, "canarias"),
    Station("Santa_Cruz_Tenerife", 28.46, -16.25, "canarias"),
    Station("Las_Palmas", 28.10, -15.41, "canarias"),
    Station("Arrecife_Lanzarote", 28.96, -13.55, "canarias"),
    Station("Puerto_Rosario_Fuerteventura", 28.50, -13.86, "canarias"),
    Station("San_Sebastian_Gomera", 28.09, -17.11, "canarias"),
    Station("Valverde_Hierro", 27.81, -17.92, "canarias"),
    Station("Santa_Cruz_La_Palma", 28.68, -17.76, "canarias"),
    Station("Madrid", 40.42, -3.70, "peninsula"),
    Station("Barcelona", 41.39, 2.17, "peninsula"),
    Station("Valencia", 39.47, -0.38, "peninsula"),
    Station("Sevilla", 37.39, -5.98, "peninsula"),
    Station("Zaragoza", 41.65, -0.88, "peninsula"),
    Station("Malaga", 36.72, -4.42, "peninsula"),
    Station("Murcia", 37.98, -1.13, "peninsula"),
    Station("Palma_Mallorca", 39.57, 2.65, "peninsula"),
    Station("Bilbao", 43.26, -2.93, "peninsula"),
    Station("Alicante", 38.35, -0.48, "peninsula"),
    Station("Cordoba", 37.89, -4.78, "peninsula"),
    Station("Valladolid", 41.65, -4.72, "peninsula"),
    Station("Vigo", 42.24, -8.72, "peninsula"),
    Station("Gijon", 43.54, -5.66, "peninsula"),
    Station("Granada", 37.18, -3.60, "peninsula"),
    Station("A_Coruna", 43.36, -8.41, "peninsula"),
    Station("Vitoria", 42.85, -2.67, "peninsula"),
    Station("Santander", 43.46, -3.80, "peninsula"),
    Station("Pamplona", 42.82, -1.64, "peninsula"),
    Station("Toledo", 39.86, -4.02, "peninsula"),
    Station("Badajoz", 38.88, -6.97, "peninsula"),
    Station("Salamanca", 40.97, -5.66, "peninsula"),
    Station("Logrono", 42.47, -2.45, "peninsula"),
    Station("Caceres", 39.48, -6.37, "peninsula"))

  /** Deterministic weather readings over the station dimension: one fresh
    * and one stale reading per station so latest-per-key dedup is
    * observable. Values are a deterministic function of the station index
    * (mock ranges, reference: weather_producer.py:67-76).
    */
  def mockWeather: Seq[WeatherEvent] =
    stations.zipWithIndex.flatMap { case (st, i) =>
      val fresh = WeatherEvent("OpenWeather", st.name, st.lat, st.lon,
        wind_speed = 5.0 + (i * 7 % 56),   // 5..60
        wind_deg = (i * 37 % 360).toDouble,
        humidity = 10.0 + (i * 11 % 81),   // 10..90
        temperature = 15.0 + (i * 3 % 21), // °C quirk preserved
        timestamp = 1700000600.0 + i)
      val stale = fresh.copy(
        wind_speed = 1.0, humidity = 99.0, temperature = 5.0,
        timestamp = 1700000000.0 + i)
      Seq(stale, fresh)
    }
}
