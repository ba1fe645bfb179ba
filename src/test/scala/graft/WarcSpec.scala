package graft

import graft.sources.Warc

class WarcSpec extends SparkSpec {

  private def closedForm(seed: Long, i: Int): (Char, Int, Boolean) = (
    ('a' + ((seed + 3L * i) % 26)).toInt.toChar,
    (10 + (seed * 3 + i * 17L) % 91).toInt,
    (seed + i) % 3 == 0)

  test("multi-member gzip + Content-Length framing recover every record") {
    val seed = 5L
    val n = 6 // covers all header rotations and both trap phases
    val recs = Warc.parseWarcGz(seed, Warc.synthWarcGz(seed, n))
    assert(recs.length === n,
      "a scanning (non-Content-Length) parser would split trap bodies " +
        "and inflate the record count")
    recs.zipWithIndex.foreach { case (r, i) =>
      val (c, len, trap) = closedForm(seed, i)
      assert(r.rec_idx === i)
      assert(r.warc_type === "response", s"header rotation $i")
      assert(r.target_uri === s"https://example.org/$seed/$i")
      assert(r.content_length === (if (trap) 29 else 0) + len)
      assert(r.first_char === (if (trap) "W" else c.toString))
      assert(r.last_char === c.toString)
    }
  }

  test("trap bodies carry a literal record marker INSIDE their extent") {
    // (seed + i) % 3 == 0 plants "WARC/1.0\r\n..." at body start; the
    // parser must sail past it because framing comes from Content-Length
    val seed = 3L
    val recs = Warc.parseWarcGz(seed, Warc.synthWarcGz(seed, 4))
    assert(recs.count(_.first_char == "W") === 2) // i = 0 and i = 3
    assert(recs.length === 4)
  }

  test("unknown headers and field order are insignificant") {
    // synthWarcGz rotates the header block by record index and always
    // includes X-Crawl-Depth; every rotation must parse identically
    val recs = Warc.parseWarcGz(7L, Warc.synthWarcGz(7L, 6))
    assert(recs.map(_.warc_type).distinct === Seq("response"))
    assert(recs.map(_.rec_idx) === (0 until 6))
  }

  test("malformed payloads salvage the valid prefix, never throw") {
    assert(Warc.parseWarcGz(1L, null) === Nil)
    assert(Warc.parseWarcGz(1L, Array.emptyByteArray) === Nil)
    assert(Warc.parseWarcGz(1L,
      "not gzip at all".getBytes("US-ASCII")) === Nil)
    val whole = Warc.synthWarcGz(2L, 4)
    // truncating mid-stream kills the gzip trailer of a later member:
    // the inflate aborts, and the contract is records-parsed-so-far or
    // nothing — never an exception
    val cut = Warc.parseWarcGz(2L, whole.take(whole.length / 2))
    assert(cut.length < 4)
  }

  test("zero-length records are emitted with null chars, rec_idx stays dense") {
    // hand-built single gzip member: record 0 has Content-Length 0 (a
    // valid empty body), record 1 is ordinary — the empty record must
    // occupy rec_idx 0 rather than silently vanishing and desyncing any
    // oracle that enumerates every record
    val raw = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Target-URI: https://example.org/empty\r\n" +
      "Content-Length: 0\r\n" +
      "\r\n" +
      "\r\n\r\n" +
      "WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Target-URI: https://example.org/full\r\n" +
      "Content-Length: 4\r\n" +
      "\r\n" +
      "body" +
      "\r\n\r\n").getBytes("US-ASCII")
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(raw); gz.close()
    val recs = Warc.parseWarcGz(9L, bos.toByteArray)
    assert(recs.length === 2)
    assert(recs(0).rec_idx === 0 && recs(0).content_length === 0)
    assert(recs(0).first_char == null && recs(0).last_char == null)
    assert(recs(1).rec_idx === 1 && recs(1).first_char === "b" &&
      recs(1).last_char === "y")
  }

  test("Spark plumbing roundtrip: per-id record counts and schema") {
    val df = spark.range(0L, 30L).toDF("doc_id")
    val out = Warc.warcRecords(df, "doc_id")
    assert(out.schema.fieldNames.toSeq === Seq("media_id", "rec_idx",
      "warc_type", "target_uri", "content_length", "first_char",
      "last_char"))
    val counts = out.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 30L).foreach { id =>
      assert(counts(id) === 2 + id % 4, s"record count for id $id")
    }
  }
}
