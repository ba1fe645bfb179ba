package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `BinaryType` columns plus a typed metadata struct, processed in
  * partition-sized batches. The Spark-side contract (schema, partitioning,
  * batch shape) is real and tested; the codec itself is STUBBED with a
  * deterministic fake because no image/audio libraries exist in this
  * container — swap `decodeStub` for a real decoder at deploy time.
  *
  * Scale notes: payloads never pass through a shuffle (decode early, drop
  * the bytes, keep features); `mapPartitions` amortizes per-batch codec
  * init (model load, JNI handles) exactly like a Pandas-UDF batch would.
  */
object Multimodal {

  /** Canonical multimodal schema: opaque bytes + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** Build a media table from any source table with a binary-able column —
    * used by tests/queries to exercise the plumbing on the documents corpus
    * (text bytes standing in for an encoded payload).
    */
  def fromBinaryColumn(df: DataFrame, idCol: String, binCol: String,
      modality: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(modality).as("modality"),
      col(binCol).cast("binary").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        lit(null).cast("integer").as("width"),
        lit(null).cast("integer").as("height"),
        lit(null).cast("long").as("duration_ms")).as("meta"))

  /** Feature row produced by the (stubbed) decoder. */
  case class MediaFeatures(
      media_id: Long,
      modality: String,
      byte_len: Int,
      // deterministic fake "content features" — replace with real decode:
      mean_byte: Double,
      head_hash: Long,
      frame_count: Int)

  /** STUB decoder: deterministic features from the raw bytes. A real
    * implementation would decode image/audio here (per-partition codec
    * init, batched decode); the Spark plumbing around it is unchanged.
    */
  def decodeStub(payload: Array[Byte]): (Double, Long, Int) = {
    if (payload == null || payload.isEmpty) (0.0, 0L, 0)
    else {
      var sum = 0L
      var h = 1125899906842597L // deterministic FNV-ish rolling hash
      var i = 0
      while (i < payload.length) {
        sum += payload(i) & 0xff
        if (i < 16) h = h * 31 + (payload(i) & 0xff)
        i += 1
      }
      (sum.toDouble / payload.length, h, (payload.length + 63) / 64)
    }
  }

  /** Batched feature extraction over the payload column. `mapPartitions`
    * is the JVM analogue of `mapInPandas`: one codec context per partition,
    * rows streamed through in batches, features out, bytes dropped.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "modality", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec init would go here (model load / JNI handle)
        rows.map { case (id, modality, payload) =>
          val (meanByte, headHash, frames) = decodeStub(payload)
          MediaFeatures(id, modality,
            if (payload == null) 0 else payload.length, meanByte, headHash, frames)
        }
      }
      .toDF()
  }

  /** Resize/frame-sample stub: keeps every `stride`-th 64-byte "frame" of
    * the payload — the partition/batch shape of real frame sampling.
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.withColumn("frames",
      // i * 64 < length guard: without it a payload whose length is an
      // exact multiple of 64 (or empty) gains a phantom empty trailing
      // frame, disagreeing with decodeStub's ceil(len/64) frame_count
      expr(s"""transform(
                 filter(sequence(0, int(length(payload) / 64)),
                        i -> i % $stride = 0 AND i * 64 < length(payload)),
                 i -> substring(payload, i * 64 + 1, 64))"""))
      .withColumn("n_sampled_frames", size(col("frames")))

  /** Per-sampled-frame feature rows: (media_id, frame_idx, frame_len,
    * mean_byte) for every non-empty `stride`-th frame — the per-frame
    * feature table a video pipeline feeds an encoder, as pure codegen HOFs
    * (explode the frame-index sequence, slice, fold). `frame_idx` is the
    * ORIGINAL frame number, so downstream can align features to timestamps.
    * The byte stats stand in for a real per-frame decode, same stub
    * contract as `decodeStub`.
    */
  def frameStats(media: DataFrame, stride: Int): DataFrame =
    media
      .withColumn("s", col("payload").cast("string"))
      .select(col("media_id"), col("s"),
        explode(expr(
          s"filter(sequence(0, int(length(s) / 64)), i -> i % $stride = 0)"
        )).as("frame_idx"))
      .withColumn("f", expr("substring(s, frame_idx * 64 + 1, 64)"))
      .filter(length(col("f")) > 0)
      .select(col("media_id"), col("frame_idx"),
        length(col("f")).as("frame_len"),
        round(
          expr("aggregate(transform(sequence(1, length(f)), " +
            "i -> ascii(substring(f, i, 1))), 0L, (a, x) -> a + x)")
            / length(col("f")), 4).as("mean_byte"))
}
