package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WARC ingestion — the Common Crawl wire shape, which is what a real
  * 100 TB training-data pipeline actually reads: a `.warc.gz` file is a
  * CONCATENATION of gzip members, one member per WARC record, each
  * record being `WARC/1.0\r\n` + header block + `\r\n` + exactly
  * `Content-Length` body bytes + `\r\n\r\n`. Both halves are decoded
  * for real here, pure-JVM: multi-member gzip through
  * `java.util.zip.GZIPInputStream` (which walks member boundaries) and
  * a Content-Length-framed record parser. Same synthesize-and-decode
  * oracle discipline as the WAV/BMP/PNG codecs (`multimodal/
  * Multimodal.scala`): genuine container bytes in, every output column
  * from the parser out, content closed-form so the driver's DuckDB gate
  * re-derives it byte-free.
  *
  * Two deliberate traps are synthesized into every payload so the gate
  * pins PROTOCOL correctness, not just happy-path splitting:
  *  - every third body STARTS with a literal `WARC/1.0\r\n...` record
  *    marker — a parser that scans for the next magic line instead of
  *    honoring Content-Length splits the body and breaks the record
  *    count and every downstream length;
  *  - the header block order rotates per record and always carries an
  *    unknown extension header (`X-Crawl-Depth`) — field order and
  *    unknown fields are explicitly insignificant per the WARC spec.
  *
  * Scale notes: payloads are parsed inside one mapPartitions pass and
  * dropped — bytes never cross a shuffle, per-partition codec state
  * (the inflater) is reused, exactly the discipline of
  * `Multimodal.extractFeatures`. On a real cluster the same parser body
  * runs over `spark.read.format("binaryFile")` splits of actual crawl
  * shards; gzip members are the parallelism unit there, as in every
  * published Common Crawl pipeline.
  */
object Warc {

  /** The record-marker trap planted at the start of every third body:
    * syntactically a valid-looking record head, but INSIDE a body's
    * Content-Length extent, so a framing-correct parser never sees it.
    */
  val TrapPrefix: String = "WARC/1.0\r\nWARC-Type: trap\r\n\r\n" // 29 bytes

  /** One parsed record: identity, the two headers worth extracting,
    * and body facts computed from the actual framed body bytes.
    */
  case class ParsedRecord(
      media_id: Long,
      rec_idx: Int,
      warc_type: String,
      target_uri: String,
      content_length: Int,
      first_char: String,
      last_char: String)

  /** Closed-form record content for (seed, i): body char, body filler
    * length, and whether the record carries the trap prefix. Mirrored
    * verbatim by the DuckDB oracle SQL.
    */
  private def bodyChar(seed: Long, i: Int): Char =
    ('a' + ((seed + 3L * i) % 26)).toInt.toChar
  private def fillerLen(seed: Long, i: Int): Int =
    (10 + (seed * 3 + i * 17L) % 91).toInt
  private def hasTrap(seed: Long, i: Int): Boolean = (seed + i) % 3 == 0

  /** Minimal RFC 1952 gzip member writer sharing ONE Deflater across
    * members: a fresh `GZIPOutputStream` per member allocates a native
    * zlib context each time (~256 KiB + JNI setup), which dominated the
    * gate's synthesis cost 5:1 when profiled over 175k members. One of
    * these per partition is exactly the per-partition-codec-init
    * discipline `mapPartitions` exists for. Emits a byte-identical
    * wire format to GZIPOutputStream: 10-byte header, raw-deflate body,
    * CRC-32 + ISIZE trailer.
    */
  final class GzMemberWriter {
    private val defl = new java.util.zip.Deflater(
      java.util.zip.Deflater.BEST_SPEED, /* nowrap = */ true)
    private val crc = new java.util.zip.CRC32()
    private val tmp = new Array[Byte](8192)
    private val header = Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0)
    def writeMember(rec: Array[Byte],
        out: java.io.ByteArrayOutputStream): Unit = {
      out.write(header)
      defl.reset(); crc.reset()
      defl.setInput(rec); defl.finish()
      while (!defl.finished()) out.write(tmp, 0, defl.deflate(tmp))
      crc.update(rec)
      val trailer = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(crc.getValue.toInt).putInt(rec.length)
      out.write(trailer.array())
    }
  }

  /** Synthesize a genuine multi-member `.warc.gz` payload: `nRec`
    * records, each deflated into its OWN gzip member (the Common Crawl
    * layout — members are the random-access/parallelism unit), bodies
    * from the closed form above, header order rotated by record index,
    * an unknown extension header always present. Pass a shared `writer`
    * when synthesizing many payloads in one partition.
    */
  def synthWarcGz(seed: Long, nRec: Int,
      writer: GzMemberWriter = new GzMemberWriter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < nRec) {
      val body = (if (hasTrap(seed, i)) TrapPrefix else "") +
        bodyChar(seed, i).toString * fillerLen(seed, i)
      val bodyBytes = body.getBytes("US-ASCII")
      val headers = Seq(
        "WARC-Type: response",
        s"WARC-Record-ID: <urn:uuid:$seed-$i>",
        s"WARC-Target-URI: https://example.org/$seed/$i",
        "WARC-Date: 2026-08-16T00:00:00Z",
        s"X-Crawl-Depth: $i", // unknown field: parsers MUST skip it
        s"Content-Length: ${bodyBytes.length}")
      val rot = i % headers.length // order is insignificant per spec
      val block = (headers.drop(rot) ++ headers.take(rot))
        .mkString("", "\r\n", "\r\n")
      val rec = new java.io.ByteArrayOutputStream()
      rec.write("WARC/1.0\r\n".getBytes("US-ASCII"))
      rec.write(block.getBytes("US-ASCII"))
      rec.write("\r\n".getBytes("US-ASCII"))
      rec.write(bodyBytes)
      rec.write("\r\n\r\n".getBytes("US-ASCII"))
      writer.writeMember(rec.toByteArray, out)
      i += 1
    }
    out.toByteArray
  }

  /** REAL `.warc.gz` parse: inflate the full multi-member stream, then
    * walk records by the protocol — magic line, header block to the
    * empty line (field names case-insensitive, unknown fields skipped,
    * any order), exactly Content-Length body bytes, CRLF CRLF. Returns
    * the records parsed up to the first malformation and drops the
    * rest (a curation pipeline salvages the valid prefix of a damaged
    * shard, it doesn't die — the same contract as the media decoders'
    * None). A missing/invalid Content-Length aborts at that record:
    * framing without it would be guessing.
    */
  def parseWarcGz(mediaId: Long, payload: Array[Byte]): Seq[ParsedRecord] = {
    if (payload == null || payload.length == 0) return Nil
    val bytes =
      try {
        val gis = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(payload))
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](8192)
        var n = gis.read(tmp)
        while (n > 0) { buf.write(tmp, 0, n); n = gis.read(tmp) }
        buf.toByteArray
      } catch { case _: java.io.IOException => return Nil }
    val recs = scala.collection.mutable.ArrayBuffer.empty[ParsedRecord]
    var off = 0
    def line(): Option[String] = {
      var j = off
      while (j + 1 < bytes.length &&
        !(bytes(j) == '\r' && bytes(j + 1) == '\n')) j += 1
      if (j + 1 >= bytes.length) None
      else {
        val s = new String(bytes, off, j - off, "US-ASCII")
        off = j + 2
        Some(s)
      }
    }
    var idx = 0
    var ok = true
    while (ok && off < bytes.length) {
      ok = line().contains("WARC/1.0")
      if (ok) {
        var wtype = ""; var uri = ""; var clen = -1
        var h = line()
        while (ok && h.exists(_.nonEmpty)) {
          val s = h.get
          val c = s.indexOf(':')
          if (c < 0) ok = false
          else {
            val k = s.substring(0, c).trim.toLowerCase
            val v = s.substring(c + 1).trim
            k match {
              case "warc-type" => wtype = v
              case "warc-target-uri" => uri = v
              case "content-length" =>
                clen = try v.toInt catch { case _: NumberFormatException => -1 }
              case _ => () // unknown/uninteresting fields: skipped
            }
            h = line()
          }
        }
        ok = ok && h.isDefined && clen >= 0 &&
          off.toLong + clen + 4 <= bytes.length
        if (ok) {
          val body = new String(bytes, off, clen, "US-ASCII")
          off += clen
          // the record terminator is part of the framing contract
          ok = bytes(off) == '\r' && bytes(off + 1) == '\n' &&
            bytes(off + 2) == '\r' && bytes(off + 3) == '\n'
          off += 4
          if (ok) {
            // zero-length bodies are VALID WARC records (e.g. an empty
            // response) — emit them with null first/last char so rec_idx
            // stays dense and in sync with any oracle that enumerates
            // every record, instead of silently desyncing the index
            if (clen > 0)
              recs += ParsedRecord(mediaId, idx, wtype, uri, clen,
                body.head.toString, body.last.toString)
            else
              recs += ParsedRecord(mediaId, idx, wtype, uri, 0, null, null)
            idx += 1
          }
        }
      }
    }
    recs.toSeq
  }

  /** Synthesize-and-REALLY-parse WARC records for each id of `df`: one
    * multi-member `.warc.gz` per id (2 + id mod 4 records), parsed in
    * the same mapPartitions pass, every output column from the parser.
    */
  def warcRecords(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        val writer = new GzMemberWriter // one native zlib ctx / partition
        ids.flatMap { id =>
          parseWarcGz(id, synthWarcGz(id, (2 + id % 4).toInt, writer))
        }
      }
      .toDF()
  }
}
