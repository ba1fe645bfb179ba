package graft

import graft.sources.{FileSourceConfig, KafkaSourceConfig, ValueStream}
import graft.streaming.SilverJob
import org.apache.spark.sql.streaming.Trigger

/** The configurable source layer behind the value-stream contract. Kafka
  * itself can't run offline, so its test pins the exact option surface the
  * reference uses (fire_risk_processor.py:49-57); the file source runs the
  * same contract end-to-end.
  */
class ValueStreamSpec extends SparkSpec {
  import spark.implicits._

  test("KafkaSourceConfig reproduces the reference reader surface") {
    val cfg = KafkaSourceConfig("localhost:9092", "fire-events")
    assert(cfg.format === "kafka")
    assert(cfg.options === Map(
      "kafka.bootstrap.servers" -> "localhost:9092",
      "subscribe" -> "fire-events",
      "startingOffsets" -> "earliest"))
    // production rate-cap passes through untouched
    val capped = cfg.copy(extra = Map("maxOffsetsPerTrigger" -> "100000"))
    assert(capped.options("maxOffsetsPerTrigger") === "100000")
  }

  test("file value-stream drives the silver topology end-to-end") {
    val dropDir = tmpDir("value-drop")
    val json =
      """{"source":"NASA_VIIRS","region":"canarias","lat":28.29,"lon":-16.5,""" +
        """"temp_k":350.0,"confidence":"h","timestamp":1.7e9}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dropDir, "batch-0.jsonl"),
      s"$json\n$json\n".getBytes("UTF-8"))
    val stream = ValueStream.open(spark, FileSourceConfig(dropDir))
    assert(stream.isStreaming)
    assert(stream.columns.toSeq === Seq("value"))
    val q = SilverJob.fireSilver(stream)
      .writeStream.format("memory").queryName("vs_sink")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("vs_sink")
    assert(got.count() === 2)
    assert(got.select($"region").as[String].collect().toSet === Set("canarias"))
  }
}
