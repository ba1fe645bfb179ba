package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Streaming source configuration behind SilverJob's value-stream contract
  * (reference: fire_risk_processor.py:49-57 — `format("kafka")`,
  * `kafka.bootstrap.servers`, `subscribe`, `startingOffsets`).
  *
  * Every source resolves to a streaming DataFrame with exactly one string
  * `value` column — the canonical shape the Silver parsers consume — so
  * swapping Kafka for files (backfill/replay) or MemoryStream (tests) is a
  * config change, not a topology change. The Kafka row contract
  * (key/value/topic/partition/offset binary columns, value cast to string)
  * is encoded here; the connector jar is an environment concern, not a
  * code one.
  */
sealed trait StreamSourceConfig {
  /** DataStreamReader format name. */
  def format: String
  /** The exact option map handed to the reader. */
  def options: Map[String, String]
}

/** The reference's Kafka surface, option-for-option. `extra` passes any
  * further `kafka.*`/connector options (e.g. `maxOffsetsPerTrigger`, the
  * per-microbatch rate cap that matters at production volume).
  */
final case class KafkaSourceConfig(
    bootstrapServers: String,
    subscribe: String,
    startingOffsets: String = "earliest",
    extra: Map[String, String] = Map.empty) extends StreamSourceConfig {
  def format: String = "kafka"
  def options: Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "subscribe" -> subscribe,
    "startingOffsets" -> startingOffsets) ++ extra
}

/** File-drop source (offline stand-in and the standard backfill path):
  * each line of each new file in `dir` is one `value` row — the same
  * at-least-once-per-file semantics Kafka gives per record.
  * `maxFilesPerTrigger` is the file-source analogue of
  * `maxOffsetsPerTrigger`.
  */
final case class FileSourceConfig(
    dir: String,
    maxFilesPerTrigger: Option[Int] = None) extends StreamSourceConfig {
  def format: String = "text"
  def options: Map[String, String] =
    Map("path" -> dir) ++
      maxFilesPerTrigger.map(n => "maxFilesPerTrigger" -> n.toString)
}

object ValueStream {

  /** Open the configured source as a `value: string` stream. */
  def open(spark: SparkSession, cfg: StreamSourceConfig): DataFrame = {
    val loaded = spark.readStream.format(cfg.format).options(cfg.options).load()
    cfg match {
      case _: KafkaSourceConfig => fromKafkaRows(loaded)
      case _: FileSourceConfig =>
        loaded.select(col("value").cast("string").as("value"))
    }
  }

  /** The Kafka ROW contract, factored so ANY source producing the Kafka
    * wire schema (binary key/value + topic/partition/offset/timestamp)
    * feeds the identical parse path — the real connector, an embedded
    * test harness, or a rate source mapped to the wire shape
    * (StreamingSpec's Kafka-shaped contract case). Kafka rows carry
    * binary key/value; the contract projects the payload
    * (fire_risk_processor.py:56).
    */
  def fromKafkaRows(kafkaRows: DataFrame): DataFrame =
    kafkaRows.selectExpr("CAST(value AS STRING) AS value")
}
