package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "abcd" * 40),  // 160 bytes
    (2L, "x"),
    (3L, "")).toDF("doc_id", "text")

  test("binary-column schema contract") {
    val media = Multimodal.fromBinaryColumn(docs, "doc_id", "text", "image")
    assert(media.schema.fieldNames.toSeq ===
      Seq("media_id", "modality", "payload", "meta"))
    assert(media.schema("payload").dataType.typeName === "binary")
    assert(media.schema("meta").dataType.typeName === "struct")
  }

  test("feature extraction via mapPartitions: deterministic stub features") {
    val media = Multimodal.fromBinaryColumn(docs, "doc_id", "text", "image")
    val f = Multimodal.extractFeatures(media).orderBy($"media_id").collect()
    assert(f(0).getAs[Int]("byte_len") === 160)
    assert(f(0).getAs[Int]("frame_count") === 160 / 64 + 1)
    // mean byte of "abcd" = (97+98+99+100)/4 = 98.5
    assert(math.abs(f(0).getAs[Double]("mean_byte") - 98.5) < 1e-9)
    assert(f(1).getAs[Int]("byte_len") === 1)
    assert(f(2).getAs[Int]("byte_len") === 0 && f(2).getAs[Int]("frame_count") === 0)
    // determinism: same payload → same head_hash
    val again = Multimodal.extractFeatures(media).orderBy($"media_id").collect()
    assert(f.map(_.getAs[Long]("head_hash")).toSeq ===
      again.map(_.getAs[Long]("head_hash")).toSeq)
  }

  test("frame sampling keeps every stride-th 64-byte frame") {
    val media = Multimodal.fromBinaryColumn(docs, "doc_id", "text", "video")
    val s = Multimodal.sampleFrames(media, stride = 2).orderBy($"media_id").collect()
    // 160 bytes → frames at offsets 0,64,128 ; stride 2 keeps idx 0,2
    assert(s(0).getAs[Int]("n_sampled_frames") === 2)
    // empty payload: no frames (no phantom empty trailing frame)
    assert(s(2).getAs[Int]("n_sampled_frames") === 0)
    // exact multiple of 64: ceil semantics, consistent with decodeStub
    val m128 = Multimodal.fromBinaryColumn(
      Seq((9L, "ab" * 64)).toDF("doc_id", "text"), "doc_id", "text", "video")
    val f128 = Multimodal.sampleFrames(m128, stride = 1).collect().head
    assert(f128.getAs[Int]("n_sampled_frames") === 2) // 128 bytes = 2 frames, not 3
  }

  test("frameStats: original frame indices, clamped tail length, exact mean byte") {
    val media = Multimodal.fromBinaryColumn(docs, "doc_id", "text", "video")
    val f = Multimodal.frameStats(media, stride = 2)
      .orderBy($"media_id", $"frame_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    // doc 1 (160 bytes of "abcd"…): stride-2 frames 0 (full 64) and 2
    // (bytes 128..159 → 32); mean of repeating abcd = 98.5 for any
    // 4-aligned window. doc 2 ("x"): frame 0 of length 1, mean 120.
    // doc 3 (""): no frames.
    assert(f.toSeq === Seq(
      (1L, 0, 64, 98.5),
      (1L, 2, 32, 98.5),
      (2L, 0, 1, 120.0)))
  }
}
