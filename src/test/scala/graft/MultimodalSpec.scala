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

  test("WAV codec: a hand-built PCM16 file decodes to its exact samples") {
    // 4 known samples at 8kHz mono: peak and rms are hand-computable
    val samples = Array[Short](1000, -2000, 3000, -32768)
    val buf = java.nio.ByteBuffer.allocate(44 + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + 8).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
    buf.put("data".getBytes).putInt(8)
    samples.foreach(buf.putShort)
    val Some((rate, ch, n, durMs, peak, rms)) = Multimodal.decodeWav(buf.array())
    assert((rate, ch, n, durMs, peak) === ((8000, 1, 4, 0L, 32768)))
    val expectRms = math.sqrt(
      samples.map(s => s.toLong * s).sum.toDouble / 4)
    assert(rms === expectRms)
  }

  test("WAV codec: chunk walk skips unknown chunks (any order, word-aligned)") {
    // LIST chunk with ODD length before fmt/data: the walk must skip its
    // pad byte or every later offset is off-by-one
    val samples = Array[Short](5, -5)
    val junk = 7
    val buf = java.nio.ByteBuffer.allocate(44 + 4 + 8 + junk + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + 4 + 8 + junk + 1).put("WAVE".getBytes)
    buf.put("LIST".getBytes).putInt(junk)
    (1 to junk + 1).foreach(_ => buf.put(9.toByte)) // junk + pad byte
    buf.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(44100).putInt(88200).putShort(2).putShort(16)
    buf.put("data".getBytes).putInt(4)
    samples.foreach(buf.putShort)
    val Some((rate, _, n, _, peak, _)) = Multimodal.decodeWav(buf.array())
    assert((rate, n, peak) === ((44100, 2, 5)))
  }

  test("WAV codec: malformed payloads are rejected, never thrown") {
    assert(Multimodal.decodeWav(null).isEmpty)
    assert(Multimodal.decodeWav(Array[Byte]()).isEmpty)
    assert(Multimodal.decodeWav(
      ("not a riff header at all padpadpad" * 2).getBytes).isEmpty)
    // right magic, truncated mid-chunk: chunk length overruns the buffer
    val wav = Multimodal.synthWav(1L, 100)
    assert(Multimodal.decodeWav(wav.take(50)).isEmpty)
    // non-PCM audioFormat rejected
    val bad = wav.clone()
    bad(20) = 3 // audioFormat = IEEE float
    assert(Multimodal.decodeWav(bad).isEmpty)
  }

  test("WAV synth→decode roundtrip matches the closed form end to end") {
    val feats = Multimodal.wavFeatures(
      Seq(3L, 42L).toDF("doc_id"), "doc_id")
      .orderBy($"media_id").collect()
    feats.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val n = (1000 + id % 500).toInt
      val s = (0 until n).map(k =>
        ((id * 7919 + k.toLong * 104729) % 65536 - 32768).toInt)
      assert(r.getAs[Int]("sample_rate") === 44100)
      assert(r.getAs[Int]("channels") === 1)
      assert(r.getAs[Int]("n_samples") === n)
      assert(r.getAs[Long]("duration_ms") === n.toLong * 1000 / 44100)
      assert(r.getAs[Int]("peak") === s.map(math.abs).max)
      assert(r.getAs[Double]("rms") ===
        math.sqrt(s.map(x => x.toLong * x).sum.toDouble / n))
    }
  }

  test("BMP codec: ImageIO decodes the synthesized container to the " +
      "closed-form pixels, bottom-up order verified per pixel") {
    val (seed, w, h) = (7L, 5, 4) // odd width => 15-byte rows, 1-byte pad
    val payload = Multimodal.synthBmp(seed, w, h)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    assert(img != null, "JDK ImageIO must read the synthesized BMP")
    assert(img.getWidth === w && img.getHeight === h)
    def f(k: Long, c: Int) = ((seed * 7919 + k * 104729 + c * 131) % 256).toInt
    for (yImg <- 0 until h; x <- 0 until w) {
      val k = (h - 1 - yImg).toLong * w + x // stored rows run bottom-up
      val rgb = img.getRGB(x, yImg)
      assert(((rgb >> 16) & 0xff) === f(k, 2), s"R at ($x,$yImg)")
      assert(((rgb >> 8) & 0xff) === f(k, 1), s"G at ($x,$yImg)")
      assert((rgb & 0xff) === f(k, 0), s"B at ($x,$yImg)")
    }
    // decoder features agree with direct pixel math
    val Some((dw, dh, sr, sg, sb, wr)) = Multimodal.decodeBmp(payload)
    assert((dw, dh) === (w, h))
    val ks = for (yImg <- 0 until h; x <- 0 until w)
      yield (yImg.toLong * w + x, (h - 1 - yImg).toLong * w + x)
    assert(sr === ks.map { case (_, k) => f(k, 2).toLong }.sum)
    assert(sg === ks.map { case (_, k) => f(k, 1).toLong }.sum)
    assert(sb === ks.map { case (_, k) => f(k, 0).toLong }.sum)
    assert(wr === ks.map { case (pos, k) => pos * f(k, 2) }.sum,
      "position-weighted sum must see the decoded (top-down) orientation")
  }

  test("BMP codec: malformed payloads are rejected, never thrown") {
    assert(Multimodal.decodeBmp(null).isEmpty)
    assert(Multimodal.decodeBmp(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeBmp("not a bitmap at all, just text padded"
      .getBytes("US-ASCII")).isEmpty)
    val truncated = Multimodal.synthBmp(3L, 8, 8).take(60)
    assert(Multimodal.decodeBmp(truncated).isEmpty)
  }

  test("BMP synth→decode roundtrip through the Spark plumbing") {
    val df = spark.range(0L, 40L).toDF("doc_id")
    val out = Multimodal.bmpFeatures(df, "doc_id").collect()
    assert(out.length === 40)
    out.foreach { r =>
      val id = r.getAs[Long]("media_id")
      assert(r.getAs[Int]("width") === (8 + id % 9).toInt)
      assert(r.getAs[Int]("height") === (6 + id % 7).toInt)
      assert(r.getAs[Long]("n_pixels") ===
        (8 + id % 9) * (6 + id % 7))
    }
  }

  test("PNG codec: ImageIO inflates and de-filters the synthesized " +
      "container back to the closed-form pixels — all five filter types") {
    val (seed, w, h) = (11L, 7, 10) // h = 10 => every filter type twice
    val payload = Multimodal.synthPng(seed, w, h)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    assert(img != null, "JDK ImageIO must read the synthesized PNG")
    assert(img.getWidth === w && img.getHeight === h)
    def f(k: Long, c: Int) = ((seed * 7919 + k * 104729 + c * 131) % 256).toInt
    // per-pixel check: scanline y was STORED under filter y mod 5, so a
    // broken Sub/Up/Average/Paeth predictor fails on its own rows
    for (y <- 0 until h; x <- 0 until w) {
      val k = y.toLong * w + x // PNG scanlines are top-down: no flip
      val rgb = img.getRGB(x, y)
      val ft = y % 5
      assert(((rgb >> 16) & 0xff) === f(k, 0), s"R at ($x,$y) filter $ft")
      assert(((rgb >> 8) & 0xff) === f(k, 1), s"G at ($x,$y) filter $ft")
      assert((rgb & 0xff) === f(k, 2), s"B at ($x,$y) filter $ft")
    }
    // decoder features agree with direct pixel math; wsum weight is k
    val Some((dw, dh, sr, sg, sb, wr)) = Multimodal.decodePng(payload)
    assert((dw, dh) === (w, h))
    val ks = (0L until w.toLong * h).toSeq
    assert(sr === ks.map(f(_, 0).toLong).sum)
    assert(sg === ks.map(f(_, 1).toLong).sum)
    assert(sb === ks.map(f(_, 2).toLong).sum)
    assert(wr === ks.map(k => k * f(k, 0)).sum)
  }

  test("PNG codec: malformed payloads are rejected, never thrown") {
    assert(Multimodal.decodePng(null).isEmpty)
    assert(Multimodal.decodePng(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodePng("not a portable network graphic, just text"
      .getBytes("US-ASCII")).isEmpty)
    // truncating INSIDE the deflate data leaves a valid signature + IHDR
    // but missing pixel bytes — must surface as None, not a throw or a
    // partial raster. (Cutting only the last ~20 bytes is NOT malformed
    // by this contract: that removes just IEND + the zlib adler trailer,
    // every pixel still decodes — probed empirically on the JDK reader.)
    val whole = Multimodal.synthPng(3L, 9, 8)
    assert(Multimodal.decodePng(whole.take(whole.length - 30)).isEmpty)
    assert(Multimodal.decodePng(whole.take(whole.length / 2)).isEmpty)
  }

  test("GIF codec: ImageIO unpacks the literal LZW stream across a " +
      "mid-image dictionary reset back to the closed-form palette pixels") {
    val (seed, w, h) = (7L, 13, 21) // 273 px > 250 => crosses a CLEAR
    val payload = Multimodal.synthGif(seed, w, h)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    assert(img != null, "JDK ImageIO must read the synthesized GIF")
    assert(img.getWidth === w && img.getHeight === h)
    def idx(k: Long) = ((seed * 7919 + k * 104729) % 256).toInt
    for (y <- 0 until h; x <- 0 until w) {
      val k = y.toLong * w + x
      val j = idx(k)
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xff) === j, s"R=index at ($x,$y)")
      assert(((rgb >> 8) & 0xff) === (j * 131 + 7) % 256, s"G at ($x,$y)")
      assert((rgb & 0xff) === (j * 197 + 11) % 256, s"B at ($x,$y)")
    }
    val Some((dw, dh, sr, sg, sb, wr)) = Multimodal.decodeGif(payload)
    assert((dw, dh) === (w, h))
    val ks = (0L until w.toLong * h).toSeq
    assert(sr === ks.map(idx(_).toLong).sum)
    assert(sg === ks.map(k => ((idx(k) * 131 + 7) % 256).toLong).sum)
    assert(sb === ks.map(k => ((idx(k) * 197 + 11) % 256).toLong).sum)
    assert(wr === ks.map(k => k * idx(k)).sum,
      "weighted sum pins LZW code order across the reset")
  }

  test("GIF codec: malformed payloads are rejected, never thrown") {
    assert(Multimodal.decodeGif(null).isEmpty)
    assert(Multimodal.decodeGif(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeGif("graphics interchange this is not, chum"
      .getBytes("US-ASCII")).isEmpty)
    val whole = Multimodal.synthGif(3L, 12, 20)
    assert(Multimodal.decodeGif(whole.take(100)).isEmpty) // inside the GCT
  }

  test("GIF synth→decode roundtrip through the Spark plumbing") {
    val df = spark.range(0L, 40L).toDF("doc_id")
    val out = Multimodal.gifFeatures(df, "doc_id").collect()
    assert(out.length === 40)
    out.foreach { r =>
      val id = r.getAs[Long]("media_id")
      assert(r.getAs[Int]("width") === (10 + id % 7).toInt)
      assert(r.getAs[Int]("height") === (16 + id % 9).toInt)
    }
  }

  test("JPEG codec: the JDK's bundled codec encodes deterministically " +
      "and decodes within the lossy-proximity bound") {
    val (seed, w, h) = (11L, 13, 9) // neither dim 8/16-aligned: edge MCUs
    val p1 = Multimodal.synthJpeg(seed, w, h)
    val p2 = Multimodal.synthJpeg(seed, w, h)
    assert(p1.sameElements(p2), "JPEG encode must be deterministic in-JVM")
    assert((p1(0) & 0xff) === 0xff && (p1(1) & 0xff) === 0xd8, "SOI marker")
    val Some((dw, dh, sr, sg, sb, _)) = Multimodal.decodeJpeg(p1)
    assert((dw, dh) === (w, h), "SOF dims are exact despite lossiness")
    def f(k: Long, c: Int) = ((seed * 7919 + k * 104729 + c * 131) % 256).toInt
    val n = w.toLong * h
    val trueLum = (0L until n).map(k => f(k, 0) + f(k, 1) + f(k, 2)).sum
      .toDouble / (3.0 * n)
    val decLum = (sr + sg + sb).toDouble / (3.0 * n)
    assert(math.abs(decLum - trueLum) < 3.0,
      s"decoded mean luma $decLum vs synthesis $trueLum: a working " +
        "IDCT/upsampler keeps the mean within the quantization budget")
  }

  test("JPEG codec: malformed payloads are rejected, never thrown") {
    assert(Multimodal.decodeJpeg(null).isEmpty)
    assert(Multimodal.decodeJpeg(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeJpeg("design by committee, deflate by hand"
      .getBytes("US-ASCII")).isEmpty)
    val whole = Multimodal.synthJpeg(5L, 12, 10)
    assert(Multimodal.decodeJpeg(whole.take(20)).isEmpty) // inside DQT
  }

  test("JPEG synth→decode roundtrip through the Spark plumbing") {
    val df = spark.range(0L, 40L).toDF("doc_id")
    val out = Multimodal.jpegFeatures(df, "doc_id").collect()
    assert(out.length === 40)
    out.foreach { r =>
      val id = r.getAs[Long]("media_id")
      assert(r.getAs[Int]("width") === (9 + id % 8).toInt)
      assert(r.getAs[Int]("height") === (7 + id % 6).toInt)
      assert(r.getAs[Boolean]("lum_close"),
        s"decoded mean luma out of bound for id $id")
    }
  }

  test("AVI codec: the RIFF demux decodes every raw-DIB frame to the " +
      "closed-form pixels, bottom-up order verified per frame") {
    val (seed, w, h, n) = (9L, 5, 4, 3) // odd width => padded rows
    val payload = Multimodal.synthAvi(seed, w, h, n)
    val Some(frames) = Multimodal.decodeAvi(payload)
    assert(frames.length === n)
    def f(fi: Int, k: Long, c: Int) =
      ((seed * 7919 + fi * 31L + k * 104729 + c * 131) % 256).toInt
    frames.zipWithIndex.foreach { case ((fi, dw, dh, sr, sg, sb, wr), i) =>
      assert(fi === i && dw === w && dh === h)
      val ks = for (yImg <- 0 until h; x <- 0 until w)
        yield (yImg.toLong * w + x, (h - 1 - yImg).toLong * w + x)
      assert(sr === ks.map { case (_, k) => f(fi, k, 2).toLong }.sum)
      assert(sg === ks.map { case (_, k) => f(fi, k, 1).toLong }.sum)
      assert(sb === ks.map { case (_, k) => f(fi, k, 0).toLong }.sum)
      assert(wr === ks.map { case (pos, k) => pos * f(fi, k, 2) }.sum,
        s"frame $fi weighted sum must see decoded (top-down) coords")
    }
  }

  test("AVI codec: malformed payloads are rejected, never thrown") {
    assert(Multimodal.decodeAvi(null).isEmpty)
    assert(Multimodal.decodeAvi(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeAvi("audio video interleave, allegedly so"
      .getBytes("US-ASCII")).isEmpty)
    val whole = Multimodal.synthAvi(4L, 8, 6, 3)
    // truncating mid-movi loses a declared frame: the walk must refuse
    assert(Multimodal.decodeAvi(whole.take(whole.length - 40)).isEmpty)
    // corrupting strf's biCompression to non-BI_RGB must refuse (the
    // decoder only owns raw DIB; compressed streams are out of contract)
    val hacked = whole.clone()
    val strfAt = {
      var i = 0
      while (!(hacked(i) == 's' && hacked(i + 1) == 't' &&
        hacked(i + 2) == 'r' && hacked(i + 3) == 'f')) i += 1
      i
    }
    hacked(strfAt + 8 + 16) = 1 // BI_RLE8
    assert(Multimodal.decodeAvi(hacked).isEmpty)
    // strf raster dims disagreeing with avih must refuse even when the
    // frame chunks still match the avih-derived length — decoding with
    // avih geometry would use the wrong row stride silently
    val dimHack = whole.clone()
    dimHack(strfAt + 8 + 4) = 12 // biWidth 8 → 12, avih still says 8
    assert(Multimodal.decodeAvi(dimHack).isEmpty)
    val hHack = whole.clone()
    hHack(strfAt + 8 + 8) = 4 // biHeight 6 → 4, avih still says 6
    assert(Multimodal.decodeAvi(hHack).isEmpty)
  }

  test("MJPEG codec: demux + real JPEG decode per frame, luma within bound") {
    val seed = 11L; val w = 13; val h = 9; val n = 3
    val payload = Multimodal.synthMjpegAvi(seed, w, h, n)
    val Some(frames) = Multimodal.decodeMjpegAvi(payload)
    assert(frames.length === n)
    frames.foreach { case (fi, dw, dh, sr, sg, sb) =>
      assert(dw === w && dh === h)
      val decLum = (sr + sg + sb).toDouble / (3.0 * w * h)
      val trueLum = (0L until w.toLong * h).map { k =>
        (0 to 2).map(c =>
          ((seed * 7919 + fi * 31L + k * 104729 + c * 131) % 256).toInt).sum
      }.sum.toDouble / (3.0 * w * h)
      assert(math.abs(decLum - trueLum) < 3.0,
        s"frame $fi decoded mean luma $decLum vs synthesis $trueLum")
    }
  }

  test("MJPEG codec: malformed payloads are rejected, never thrown") {
    assert(Multimodal.decodeMjpegAvi(null).isEmpty)
    assert(Multimodal.decodeMjpegAvi(Array.emptyByteArray).isEmpty)
    val whole = Multimodal.synthMjpegAvi(5L, 12, 8, 2)
    // a raw-DIB container must refuse through the MJPEG entry (wrong
    // biCompression), and an MJPEG one through the DIB entry
    assert(Multimodal.decodeMjpegAvi(Multimodal.synthAvi(5L, 8, 6, 2)).isEmpty)
    assert(Multimodal.decodeAvi(whole).isEmpty)
    // truncating mid-movi loses a declared frame: the walk must refuse
    assert(Multimodal.decodeMjpegAvi(whole.take(whole.length - 60)).isEmpty)
    // corrupting a frame's JPEG magic makes ImageIO fail on it: the whole
    // payload must refuse, not silently skip the frame
    val jfifAt = {
      var i = 0
      while (!((whole(i) & 0xff) == 0xff && (whole(i + 1) & 0xff) == 0xd8 &&
        (whole(i + 2) & 0xff) == 0xff)) i += 1
      i
    }
    val hacked = whole.clone()
    hacked(jfifAt + 1) = 0x00
    assert(Multimodal.decodeMjpegAvi(hacked).isEmpty)
  }

  test("MJPEG synth→decode roundtrip through the Spark plumbing") {
    val df = spark.range(0L, 24L).toDF("doc_id")
    val out = Multimodal.mjpegFrameFeatures(df, "doc_id").collect()
    val byId = out.groupBy(_.getAs[Long]("media_id"))
    (0L until 24L).foreach { id =>
      val rows = byId(id)
      assert(rows.length === (2 + id % 3).toInt, s"frame count for id $id")
      rows.foreach { r =>
        assert(r.getAs[Int]("width") === (9 + id % 8).toInt)
        assert(r.getAs[Int]("height") === (7 + id % 6).toInt)
        assert(r.getAs[Boolean]("lum_close"), s"id $id frame luma drifted")
      }
    }
  }

  test("AVI synth→decode roundtrip through the Spark plumbing") {
    val df = spark.range(0L, 30L).toDF("doc_id")
    val out = Multimodal.aviFrameFeatures(df, "doc_id").collect()
    val byId = out.groupBy(_.getAs[Long]("media_id"))
    (0L until 30L).foreach { id =>
      assert(byId(id).length === (3 + id % 4).toInt, s"frame count $id")
      byId(id).foreach { r =>
        assert(r.getAs[Int]("width") === (8 + id % 5).toInt)
        assert(r.getAs[Int]("height") === (6 + id % 4).toInt)
      }
    }
  }

  test("PNG synth→decode roundtrip through the Spark plumbing") {
    val df = spark.range(0L, 40L).toDF("doc_id")
    val out = Multimodal.pngFeatures(df, "doc_id").collect()
    assert(out.length === 40)
    out.foreach { r =>
      val id = r.getAs[Long]("media_id")
      assert(r.getAs[Int]("width") === (9 + id % 8).toInt)
      assert(r.getAs[Int]("height") === (5 + id % 6).toInt)
      assert(r.getAs[Long]("n_pixels") ===
        (9 + id % 8) * (5 + id % 6))
    }
  }

  // ---------------------------------------------------------------
  // IMA-ADPCM (r14): the compressed-audio codec. The gate stream pins
  // the step index at 0 so its decoded output is closed-form (that is
  // the oracle's exactness lever); THESE tests pin the decoder's
  // general adaptation paths via encoder duality — a standard greedy
  // IMA encoder built HERE, sharing only the one-step dequant kernel,
  // whose running reconstruction must equal the decoder's output
  // exactly (the shared-state property ADPCM is built on).

  /** Independent RIFF wrapper (duplicated from synthAdpcmWav on purpose:
    * a second container construction cross-checks the decoder's walk)
    * around caller-supplied data blocks.
    */
  private def wrapAdpcm(blocks: Array[Array[Byte]], blockAlign: Int,
      rate: Int = 22050): Array[Byte] = {
    val spb = (blockAlign - 4) * 2 + 1
    val dataLen = blocks.map(_.length).sum
    val total = 12 + 28 + 12 + 8 + dataLen
    val b = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(total - 8)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(0x11).putShort(1).putInt(rate)
      .putInt(rate * blockAlign / spb)
      .putShort(blockAlign.toShort).putShort(4)
      .putShort(2).putShort(spb.toShort)
    b.put("fact".getBytes("US-ASCII")).putInt(4).putInt(blocks.length * spb)
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    blocks.foreach(b.put)
    b.array()
  }

  /** Standard greedy IMA encoder: per block, store (firstSample, index),
    * then quantize each successor against the RUNNING RECONSTRUCTION
    * (not the source) — returns the blocks plus that reconstruction and
    * the index trace. Uses Multimodal.imaStep for dequant so encoder and
    * decoder share exactly the state recurrence the format specifies.
    */
  private def imaEncode(src: Array[Int], blockAlign: Int)
      : (Array[Array[Byte]], Array[Int], Array[Int]) = {
    val spb = (blockAlign - 4) * 2 + 1
    require(src.length % spb == 0, "test signal must fill whole blocks")
    val recon = new Array[Int](src.length)
    val idxTrace = new Array[Int](src.length)
    var index = 0
    var k = 0
    val blocks = src.grouped(spb).map { blockSrc =>
      val bb = java.nio.ByteBuffer.allocate(blockAlign)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var pred = blockSrc(0)
      bb.putShort(pred.toShort).put(index.toByte).put(0.toByte)
      recon(k) = pred; idxTrace(k) = index; k += 1
      var nibLow = -1
      blockSrc.drop(1).foreach { s =>
        val step = Multimodal.imaStepTable(index)
        var diff = s - pred
        var nib = 0
        if (diff < 0) { nib = 8; diff = -diff }
        if (diff >= step) { nib |= 4; diff -= step }
        if (diff >= (step >> 1)) { nib |= 2; diff -= step >> 1 }
        if (diff >= (step >> 2)) { nib |= 1 }
        val (p, i) = Multimodal.imaStep(pred, index, nib)
        pred = p; index = i
        recon(k) = p; idxTrace(k) = i; k += 1
        if (nibLow < 0) nibLow = nib
        else { bb.put((nibLow | (nib << 4)).toByte); nibLow = -1 }
      }
      bb.array()
    }.toArray
    (blocks, recon, idxTrace)
  }

  test("ADPCM codec: decoder tracks an independent encoder's " +
      "reconstruction exactly over white noise (full table adaptation)") {
    val blockAlign = 36
    val spb = (blockAlign - 4) * 2 + 1
    // white noise over the full int16 range: the encoder's index shoots
    // up the step table, exercising adaptation the gate stream never does
    val src = Array.tabulate(4 * spb) { k =>
      (((42L * 7919 + k.toLong * 104729) % 65536) - 32768).toInt
    }
    val (blocks, recon, idxTrace) = imaEncode(src, blockAlign)
    assert(idxTrace.max >= 60, "white noise must drive the index high")
    assert(idxTrace.min === 0)
    val payload = wrapAdpcm(blocks, blockAlign)
    val Some((rate, ch, ba, samples)) = Multimodal.decodeAdpcmWav(payload)
    assert((rate, ch, ba) === (22050, 1, blockAlign))
    assert(samples.toSeq === recon.toSeq)
  }

  test("ADPCM codec: the gate stream decodes to its documented closed form") {
    for (id <- Seq(0L, 7L, 123L)) {
      val Some((rate, ch, ba, samples)) =
        Multimodal.decodeAdpcmWav(Multimodal.synthAdpcmWav(id))
      assert((rate, ch, ba) === (22050, 1, 36))
      val nb = (2 + id % 4).toInt
      assert(samples.length === nb * 65)
      val expected = (0 until nb).flatMap { b =>
        val p = (Math.floorMod(id * 7919 + b * 257, 1024) - 512).toInt
        p +: (0 until 32).flatMap { j =>
          val d = Array(1, 3, 4)(Math.floorMod(id + b * 131 + j * 17, 3).toInt)
          Seq(p + d, p)
        }
      }
      assert(samples.toSeq === expected)
    }
  }

  test("ADPCM codec: malformed payloads are rejected, never thrown") {
    val good = Multimodal.synthAdpcmWav(5L)
    assert(Multimodal.decodeAdpcmWav(null).isEmpty)
    assert(Multimodal.decodeAdpcmWav(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeAdpcmWav(good.take(30)).isEmpty) // truncated
    val badMagic = good.clone; badMagic(0) = 'X'.toByte
    assert(Multimodal.decodeAdpcmWav(badMagic).isEmpty)
    val pcmTag = good.clone; pcmTag(20) = 1 // audioFormat 0x11 → 1 (PCM)
    assert(Multimodal.decodeAdpcmWav(pcmTag).isEmpty)
    val badSpb = good.clone; badSpb(38) = 9 // samplesPerBlock 65 → 9
    assert(Multimodal.decodeAdpcmWav(badSpb).isEmpty)
    val badIdx = good.clone; badIdx(62) = 100 // first block header index > 88
    assert(Multimodal.decodeAdpcmWav(badIdx).isEmpty)
    val badFact = good.clone; badFact(48) = 7 // fact count != blocks * spb
    assert(Multimodal.decodeAdpcmWav(badFact).isEmpty)
    // data length not a multiple of blockAlign
    val ragged = wrapAdpcm(Array(Array.fill[Byte](36)(0),
      Array.fill[Byte](20)(0)), 36)
    assert(Multimodal.decodeAdpcmWav(ragged).isEmpty)
    // duplicate fmt/data/fact chunks are malformed — REJECTED, not
    // decoded from whichever chunk the walk saw last; a junk chunk of
    // any other id appended the same way must still decode (the
    // rejection is about duplication, not trailing chunks)
    def appendChunk(base: Array[Byte], id: String,
        body: Array[Byte]): Array[Byte] = {
      val hdr = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      hdr.put(id.getBytes("US-ASCII")); hdr.putInt(body.length)
      base ++ hdr.array() ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte)
         else Array.empty[Byte])
    }
    assert(Multimodal.decodeAdpcmWav(
      appendChunk(good, "data", Array.fill[Byte](36)(0))).isEmpty)
    assert(Multimodal.decodeAdpcmWav(
      appendChunk(good, "fmt ", Array.fill[Byte](20)(0))).isEmpty)
    assert(Multimodal.decodeAdpcmWav(
      appendChunk(good, "fact", Array.fill[Byte](4)(0))).isEmpty)
    assert(Multimodal.decodeAdpcmWav(
      appendChunk(good, "LIST", Array.fill[Byte](10)(0))).isDefined)
  }

  test("ADPCM synth→decode roundtrip through the Spark plumbing") {
    val df = spark.range(0L, 40L).toDF("doc_id")
    val out = Multimodal.adpcmFeatures(df, "doc_id").collect()
    assert(out.length === 40)
    out.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val nb = (2 + id % 4).toInt
      assert(r.getAs[Int]("n_blocks") === nb)
      assert(r.getAs[Int]("n_samples") === nb * 65)
      assert(r.getAs[Int]("sample_rate") === 22050)
      // features re-aggregated from a direct decode must agree
      val Some((_, _, _, samples)) =
        Multimodal.decodeAdpcmWav(Multimodal.synthAdpcmWav(id))
      assert(r.getAs[Long]("sum_samples") === samples.map(_.toLong).sum)
      assert(r.getAs[Int]("peak") === samples.map(math.abs).max)
      assert(r.getAs[Long]("wsum_samples") ===
        samples.zipWithIndex.map { case (s, k) => k.toLong * s }.sum)
    }
  }
}
