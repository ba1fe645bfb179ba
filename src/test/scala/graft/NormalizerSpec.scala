package graft

import java.nio.file.{Files, Paths}

import graft.ingest.Normalizer
import org.apache.spark.sql.functions._

class NormalizerSpec extends SparkSpec {
  import spark.implicits._

  test("FIRMS CSV → FireEvent incl. acq_date/acq_time parse") {
    val dir = tmpDir("csv")
    Files.writeString(Paths.get(s"$dir/f.csv"),
      """latitude,longitude,bright_ti4,confidence,acq_date,acq_time
        |28.29,-16.51,350.0,h,2024-01-15,1430
        |40.41,-3.70,310.0,n,2024-01-15,230
        |""".stripMargin)
    val ds = Normalizer.firesFromCsv(spark, s"$dir/f.csv", "canarias")
    val rows = ds.collect().sortBy(_.lat)
    assert(rows.length === 2)
    assert(rows(1).lat === 40.41 && rows(1).confidence === "n")
    assert(rows(0).region === "canarias" && rows(0).source === "NASA_VIIRS")
    // 2024-01-15 14:30 UTC
    assert(rows(0).timestamp === 1705329000.0)
  }

  test("FIRMS timestamps are UTC regardless of session time zone") {
    val dir = tmpDir("csv-tz")
    Files.writeString(Paths.get(s"$dir/f.csv"),
      """latitude,longitude,bright_ti4,confidence,acq_date,acq_time
        |28.29,-16.51,350.0,h,2024-01-15,1430
        |""".stripMargin)
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val got = Normalizer.firesFromCsv(spark, s"$dir/f.csv", "x")
        .collect().head.timestamp
      assert(got === 1705329000.0) // same 2024-01-15 14:30 UTC epoch
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("CSV missing acq_date/acq_time fails fast with the missing set") {
    val dir = tmpDir("csv-noacq")
    Files.writeString(Paths.get(s"$dir/f.csv"),
      """latitude,longitude,bright_ti4,confidence
        |28.29,-16.51,350.0,h
        |""".stripMargin)
    val e = intercept[IllegalArgumentException] {
      Normalizer.firesFromCsv(spark, s"$dir/f.csv", "x")
    }
    assert(e.getMessage.contains("acq_date") && e.getMessage.contains("acq_time"))
  }

  test("requireColumns fails fast with the missing set") {
    val e = intercept[IllegalArgumentException] {
      Normalizer.requireColumns(Seq(1).toDF("x"), Seq("x", "lat", "lon"))
    }
    assert(e.getMessage.contains("lat") && e.getMessage.contains("lon"))
  }

  test("OpenWeather JSON → WeatherEvent; producer extras dropped") {
    val dir = tmpDir("json")
    Files.writeString(Paths.get(s"$dir/w.json"),
      """{"name":"Madrid","coord":{"lat":40.42,"lon":-3.70},"main":{"temp":22.5,"humidity":41,"pressure":1013},"wind":{"speed":12.0,"deg":180},"dt":1700000000,"clouds":{"all":20},"zone":"centro"}
        |""".stripMargin)
    val rows = Normalizer.weatherFromJson(spark, s"$dir/w.json").collect()
    assert(rows.length === 1)
    val w = rows(0)
    assert(w.location_id === "Madrid" && w.humidity === 41.0 &&
      w.wind_speed === 12.0 && w.temperature === 22.5 && w.timestamp === 1.7e9)
  }

  test("from_json schema-on-read: extras dropped, malformed → nulls (S2)") {
    val raw = Seq(
      """{"source":"NASA_VIIRS","region":"canarias","lat":28.29,"lon":-16.51,"temp_k":350.0,"confidence":"h","timestamp":1.7e9,"EXTRA":"dropped"}""",
      """not json at all""")
      .toDF("value")
    val parsed = Normalizer.parseFireJson(raw)
    assert(parsed.columns.toSeq === Seq("source", "region", "lat", "lon",
      "temp_k", "confidence", "timestamp"))
    val rows = parsed.collect()
    assert(rows(0).getAs[Double]("lat") === 28.29)
    assert(rows(1).isNullAt(0)) // malformed row → all-null record
  }

  test("multi-region fan-out concat ≡ unionByName (nasa_producer.py:119-141)") {
    val dir = tmpDir("csv2")
    Files.writeString(Paths.get(s"$dir/a.csv"),
      "latitude,longitude,bright_ti4,confidence,acq_date,acq_time\n1.0,2.0,300.0,h,2024-01-01,0\n")
    Files.writeString(Paths.get(s"$dir/b.csv"),
      "latitude,longitude,bright_ti4,confidence,acq_date,acq_time\n3.0,4.0,310.0,l,2024-01-01,100\n")
    val ds = Normalizer.firesFromCsvRegions(spark,
      Map("canarias" -> s"$dir/a.csv", "peninsula" -> s"$dir/b.csv"))
    assert(ds.collect().map(_.region).toSet === Set("canarias", "peninsula"))
  }
}
