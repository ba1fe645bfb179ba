package graft

import java.sql.Timestamp

import graft.sources.ValueStream
import graft.streaming.{Sessionize, SilverJob}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming semantics (SURVEY §2.7): silver append topology with
  * checkpointed exactly-once restart, watermarked dedup, event-time
  * windows, and custom sessionization state.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def fireJson(lat: Double, ts: Double, conf: String = "h"): String =
    s"""{"source":"NASA_VIIRS","region":"canarias","lat":$lat,"lon":-16.5,""" +
      s""""temp_k":350.0,"confidence":"$conf","timestamp":$ts}"""

  test("StreamScale.parts: ceil growth, floor and cap clamps, sf10 basis preserved") {
    import graft.streaming.StreamScale.parts
    assert(parts(0L, 250000L, cap = 8) === 1)
    assert(parts(100000L, 250000L, cap = 8) === 1) // sf0.1 events
    assert(parts(250000L, 250000L, cap = 8) === 1) // exact boundary
    assert(parts(250001L, 250000L, cap = 8) === 2) // ceil, not floor
    assert(parts(1000000L, 250000L, cap = 8) === 4) // sf1 events
    // sf10 must land ON the cap — the partition count every sf10 record
    // was measured at, so the recorded slope basis is preserved exactly
    assert(parts(10000000L, 250000L, cap = 8) === 8)
    assert(parts(10000000L, 250000L, cap = 4) === 4)
    assert(parts(5L, 250000L, cap = 8, floor = 2) === 2)
    intercept[IllegalArgumentException](parts(1L, 0L, cap = 8))
    intercept[IllegalArgumentException](parts(1L, 10L, cap = 1, floor = 2))
  }

  test("ST1/ST2: silver append with checkpoint; restart does not duplicate") {
    implicit val sq = spark.sqlContext
    val out = tmpDir("silver-out")
    val chk = tmpDir("silver-chk")
    val mem = MemoryStream[String]
    mem.addData(fireJson(28.29, 1.7e9), fireJson(28.60, 1.7e9 + 60))

    val q1 = SilverJob.startAppendSink(
      SilverJob.fireSilver(mem.toDF().select($"value")),
      s"$out/fire_events", chk, Trigger.AvailableNow())
    q1.awaitTermination()
    assert(spark.read.parquet(s"$out/fire_events").count() === 2)

    // restart from the same checkpoint: already-committed batch not re-written
    mem.addData(fireJson(40.41, 1.7e9 + 120))
    val q2 = SilverJob.startAppendSink(
      SilverJob.fireSilver(mem.toDF().select($"value")),
      s"$out/fire_events", chk, Trigger.AvailableNow())
    q2.awaitTermination()
    val rows = spark.read.parquet(s"$out/fire_events")
    assert(rows.count() === 3) // exactly-once: 2 + 1, no dupes
    assert(rows.columns.contains("processed_at")) // ST4 stamp
  }

  test("ST5: watermarked dedup drops in-watermark duplicates") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[String]
    val dupe = fireJson(28.29, 1.7e9)
    mem.addData(dupe, dupe, fireJson(28.60, 1.7e9 + 30))

    val deduped = SilverJob.dedupWithinWatermark(
      SilverJob.withEventTime(SilverJob.fireSilver(mem.toDF().select($"value"))),
      keys = Seq("lat", "lon", "timestamp"))
    val q = deduped.writeStream.format("memory").queryName("dedup_sink")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("dedup_sink").count() === 2)
  }

  test("ST5: watermark EVICTS dedup key state — state rows track the live " +
      "window, not the stream (r14, VERDICT r13 task 6)") {
    implicit val sq = spark.sqlContext
    val t0 = 1700000000000L
    def ts(offsetH: Double): Timestamp =
      new Timestamp(t0 + (offsetH * 3600000L).toLong)
    val mem = MemoryStream[graft.queries.StreamQueries.DupEvt]
    import graft.queries.StreamQueries.DupEvt
    // the inventory gate's topology at a 1h delay (the gate itself pins
    // delay > corpus span so every duplicate is a state hit; THIS test
    // pins the other half of the contract — that an advancing watermark
    // sheds expired keys, which is what bounds state at 100 TB/day)
    val deduped = mem.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.format("memory").queryName("dedup_evict_sink")
      .outputMode("append").start()
    try {
      // batch 1: 50 distinct t0-era keys enter dedup state
      mem.addData((1 to 50).map(i => DupEvt(i.toLong, ts(0), "a", 1.0)): _*)
      q.processAllAvailable()
      val afterLoad = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(afterLoad >= 50, s"expected the 50 keys in state, saw $afterLoad")
      // batch 2: one far-future key advances the watermark ~47h past the
      // cohort; batch 3 runs an eviction pass under that watermark — all
      // 50 expired keys (ts < wm − 1h) must leave the store
      mem.addData(DupEvt(999L, ts(48), "a", 1.0))
      q.processAllAvailable()
      mem.addData(DupEvt(998L, ts(48.1), "a", 1.0))
      q.processAllAvailable()
      val afterEvict = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(afterEvict <= 2,
        s"watermark failed to evict dedup state: $afterEvict rows retained")
      // correctness untouched by eviction: all 52 distinct keys emitted
      assert(spark.table("dedup_evict_sink").count() === 52)
    } finally q.stop()
  }

  test("ST5: tumbling event-time window aggregation (append emits once watermark passes)") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[String]
    // two detections in minute 0, one in minute 7 → two 5-min windows; the
    // far-future sentinel advances the watermark past both window ends so
    // append mode emits them (its own window legitimately stays open).
    mem.addData(fireJson(1.0, 1.7e9), fireJson(2.0, 1.7e9 + 10),
      fireJson(3.0, 1.7e9 + 420), fireJson(9.0, 1.7e9 + 3600))
    val stats = SilverJob.windowedStats(
      SilverJob.withEventTime(SilverJob.fireSilver(mem.toDF().select($"value"))),
      keyCol = "region")
    val q = stats.writeStream.format("memory").queryName("win_sink")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val wins = spark.table("win_sink").orderBy($"window_start").collect()
    assert(wins.length === 2)
    assert(wins(0).getAs[Long]("n") === 2 && wins(1).getAs[Long]("n") === 1)
  }

  test("UPDATE mode: a changed key re-emits cumulative state; an unchanged key stays silent") {
    import graft.queries.StreamQueries.Evt
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Evt]
    val sink = "upd_pin_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = mem.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName(sink)
      .outputMode("update").start()
    try {
      // batch 1: both keys; batch 2: only "a" changes (same 10:00 window)
      mem.addData(Evt(Timestamp.valueOf("2024-01-01 10:05:00"), "a", 1.0),
        Evt(Timestamp.valueOf("2024-01-01 10:06:00"), "b", 1.0))
      q.processAllAvailable()
      mem.addData(Evt(Timestamp.valueOf("2024-01-01 10:20:00"), "a", 2.0))
      q.processAllAvailable()
    } finally q.stop()
    val byKey = spark.table(sink).groupBy($"event_type")
      .agg(count(lit(1)).as("emissions"), max($"n").as("last_n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // "a" was updated in two batches → emitted TWICE, second carries the
    // cumulative count (the thing append mode can never show); "b" was
    // untouched in batch 2 → exactly one emission (the thing complete
    // mode can never show)
    assert(byKey("a") === ((2L, 2L)))
    assert(byKey("b") === ((1L, 1L)))
  }

  test("stream-stream interval join with watermarks on both sides") {
    implicit val sq = spark.sqlContext
    val fires = MemoryStream[String]
    val weather = MemoryStream[(String, Double, Double)] // (region, wind, ts)
    fires.addData(fireJson(28.29, 1.7e9 + 100), fireJson(28.60, 1.7e9 + 5000))
    weather.addData(("canarias", 42.0, 1.7e9 + 80), ("canarias", 10.0, 1.7e9 + 4000))

    val f = SilverJob.withEventTime(
      SilverJob.fireSilver(fires.toDF().select($"value")))
      .select($"lat", $"region", $"event_ts".as("fire_ts"))
    val w = weather.toDF().toDF("wregion", "wind", "wts")
      .withColumn("weather_ts", timestamp_seconds($"wts"))
      .withWatermark("weather_ts", "10 minutes")
    // each fire joins weather readings from the preceding 5 minutes
    val joined = f.join(w,
      $"region" === $"wregion" &&
        $"weather_ts".between($"fire_ts" - expr("INTERVAL 5 MINUTES"), $"fire_ts"))
    val q = joined.writeStream.format("memory").queryName("ssj_sink")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("ssj_sink").select($"lat", $"wind")
      .as[(Double, Double)].collect().toSet
    // fire@+100 pairs with weather@+80 (within 5 min); fire@+5000 with w@+4000
    assert(rows === Set((28.29, 42.0)))
  }

  test("stream-stream join: state survives micro-batch boundaries and the watermark bounds it") {
    import graft.queries.StreamQueries.{Buy, Click}
    implicit val sq = spark.sqlContext
    val t0 = 1700000000000L
    def ts(offsetH: Double): Timestamp = new Timestamp(t0 + (offsetH * 3600000L).toLong)
    val memC = MemoryStream[Click]
    val memB = MemoryStream[Buy]
    // the inventory query's exact topology: 6h interval bound, 1h delay
    val joined = memC.toDF().withWatermark("c_ts", "1 hour")
      .join(memB.toDF().withWatermark("b_ts", "1 hour"),
        expr("c_user = b_user AND b_ts > c_ts AND b_ts <= c_ts + interval 6 hours"))
    val q = joined.writeStream.format("memory").queryName("ssj_state_sink")
      .outputMode("append").start()
    try {
      // batch 1: two clicks, no purchases — both enter join state
      memC.addData(Click(1L, ts(0), 1L), Click(2L, ts(0), 2L))
      q.processAllAvailable()
      // batch 2: user 1's purchase arrives A BATCH LATER than its click —
      // it can only pair if the click's state survived the boundary. The
      // far-future sentinels advance BOTH sides (the global watermark is
      // the MIN across watermarked sources — one lagging side pins it and
      // nothing ever evicts) to ~t0+47h at batch end.
      memB.addData(Buy(10L, ts(2), 1L), Buy(30L, ts(48), 999L))
      memC.addData(Click(99L, ts(48), 999L))
      q.processAllAvailable()
      // batch 3: one more sentinel pair runs an eviction pass under that
      // advanced watermark. Every t0-era row is now beyond ANY future
      // match window (clicks: c_ts < wm − 6h; the buy: all clicks it
      // could pair with must have c_ts < b_ts ≪ wm), so the state store
      // must shed them — this is the bound that keeps a 100 TB/day
      // join's state proportional to the time window, not the stream.
      memC.addData(Click(100L, ts(49), 998L))
      memB.addData(Buy(31L, ts(49), 997L))
      q.processAllAvailable()
      val pairs = spark.table("ssj_state_sink")
        .select($"click_id", $"buy_id").as[(Long, Long)].collect().toSet
      assert(pairs === Set((1L, 10L)))
      // 7 rows entered join state; the 3 t0-era rows (clicks 1 and 2, buy
      // 10) must be evicted — at most the 4 fresh sentinels may survive
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 4,
        s"watermark failed to bound join state: $stateRows rows retained")
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER: null row only AFTER the watermark closes the interval, exactly once") {
    import graft.queries.StreamQueries.{Buy, Click}
    implicit val sq = spark.sqlContext
    val t0 = 1700000000000L
    def ts(offsetH: Double): Timestamp = new Timestamp(t0 + (offsetH * 3600000L).toLong)
    val memC = MemoryStream[Click]
    val memB = MemoryStream[Buy]
    // the inventory query's exact outer topology: 6h interval, 1h delay
    val joined = memC.toDF().withWatermark("c_ts", "1 hour")
      .join(memB.toDF().withWatermark("b_ts", "1 hour"),
        expr("c_user = b_user AND b_ts > c_ts AND b_ts <= c_ts + interval 6 hours"),
        "leftOuter")
    val q = joined.writeStream.format("memory").queryName("sso_spec_sink")
      .outputMode("append").start()
    try {
      def rows() = spark.table("sso_spec_sink")
        .select($"click_id", $"buy_id".cast("string")).as[(Long, String)]
        .collect().toSet
      // batch 1: click u1 matches a purchase 2h later; click u2 never will.
      // Watermark at batch end is max(event time) − 1h = t0+1h, far below
      // u2's interval close (t0+6h) — so u2 may NOT surface yet, even as a
      // null row: its purchase could still arrive. THE semantics pin.
      memC.addData(Click(1L, ts(0), 1L), Click(2L, ts(0), 2L))
      memB.addData(Buy(10L, ts(2), 1L))
      q.processAllAvailable()
      assert(rows() === Set((1L, "10")),
        s"null row emitted BEFORE watermark closed the interval: ${rows()}")
      // batch 2 + 3: sentinels on BOTH sides (global watermark is the min)
      // push the watermark to ~t0+9h — past u2's close — and the follow-up
      // batch runs the eviction pass that emits the null-extended row.
      memC.addData(Click(99L, ts(10), 999L)); memB.addData(Buy(90L, ts(10), 999L))
      q.processAllAvailable()
      memC.addData(Click(98L, ts(10.1), 998L)); memB.addData(Buy(91L, ts(10.1), 997L))
      q.processAllAvailable()
      val fin = rows().filter(r => r._1 == 1L || r._1 == 2L)
      // exactly one null row for u2; u1 matched in-stream and must NOT also
      // emit a null twin on eviction (matched-flag tracking)
      assert(fin === Set((1L, "10"), (2L, null)),
        s"outer emission wrong after watermark close: $fin")
    } finally q.stop()
  }

  test("ST6: streaming Gold refresh via foreachBatch — rewrites per batch, skips empty gold") {
    implicit val sq = spark.sqlContext
    val root = tmpDir("gold-refresh-root")
    val chk = tmpDir("gold-refresh-chk")
    val catalog = new graft.catalog.TableCatalog(spark, root)
    val refreshes = new java.util.concurrent.atomic.AtomicInteger(0)
    def refresh(batch: org.apache.spark.sql.DataFrame): Unit = {
      refreshes.incrementAndGet()
      catalog.overwriteIfNonEmpty(
        batch.filter($"confidence" === "h").groupBy($"region")
          .agg(count(lit(1)).as("n_fires")),
        "gold", "fire_kpis")
    }
    val mem = MemoryStream[String]
    mem.addData(fireJson(28.29, 1.7e9), fireJson(28.60, 1.7e9 + 60))
    val q1 = SilverJob.startGoldRefresh(
      SilverJob.fireSilver(mem.toDF().select($"value")), chk,
      Trigger.AvailableNow(), refresh)
    q1.awaitTermination()
    assert(refreshes.get() >= 1)
    val gold1 = catalog.read("gold", "fire_kpis").collect()
    assert(gold1.length === 1 && gold1.head.getAs[Long]("n_fires") === 2)

    // second cycle: only low-confidence detections → gold df is EMPTY →
    // overwriteIfNonEmpty must leave the previous snapshot in place
    mem.addData(fireJson(40.41, 1.7e9 + 120, conf = "l"))
    val q2 = SilverJob.startGoldRefresh(
      SilverJob.fireSilver(mem.toDF().select($"value")), chk,
      Trigger.AvailableNow(), refresh)
    q2.awaitTermination()
    assert(refreshes.get() >= 2)
    val gold2 = catalog.read("gold", "fire_kpis").collect()
    assert(gold2.length === 1 && gold2.head.getAs[Long]("n_fires") === 2,
      "empty gold cycle must not clobber the live snapshot")
  }

  test("streaming MERGE sink: table converges to latest-row-per-key across batches") {
    implicit val sq = spark.sqlContext
    val cat = new graft.catalog.TableCatalog(spark, tmpDir("merge-sink"))
    val chk = tmpDir("merge-sink-chk")
    val mem = MemoryStream[(Long, String, Long)] // (key, value, ts)

    mem.addData((1L, "a", 10L), (2L, "b", 10L))
    val q1 = SilverJob.startMergeSink(
      mem.toDF().toDF("k", "v", "ts"), cat, "silver", "latest",
      keys = Seq("k"), orderCol = "ts", checkpoint = chk)
    q1.awaitTermination()
    assert(cat.read("silver", "latest").select($"k", $"v")
      .as[(Long, String)].collect().toMap === Map(1L -> "a", 2L -> "b"))

    // batch 2: update k=1, insert k=3 with an intra-batch older duplicate
    // that the per-batch dedup must discard before the merge
    mem.addData((1L, "c", 20L), (3L, "stale", 15L), (3L, "d", 25L))
    val q2 = SilverJob.startMergeSink(
      mem.toDF().toDF("k", "v", "ts"), cat, "silver", "latest",
      keys = Seq("k"), orderCol = "ts", checkpoint = chk)
    q2.awaitTermination()
    assert(cat.read("silver", "latest").select($"k", $"v")
      .as[(Long, String)].collect().toMap ===
      Map(1L -> "c", 2L -> "b", 3L -> "d"))
  }

  test("incremental gold sink: gold equals full recompute after every CDC batch") {
    implicit val sq = spark.sqlContext
    val cat = new graft.catalog.TableCatalog(spark, tmpDir("ivm-sink"))
    val chk = tmpDir("ivm-sink-chk")
    val mem = MemoryStream[(Long, String, Double, Long)] // (key, group, value, rev)

    def run(): Unit = SilverJob.startIncrementalGoldSink(
      mem.toDF().toDF("k", "g", "v", "rev"), cat, "silver", "facts",
      keys = Seq("k"), orderCol = "rev",
      goldLayer = "gold", goldTable = "facts_agg", groupCols = Seq("g"),
      valueCol = "v", checkpoint = chk).awaitTermination()

    def goldNow = cat.read("gold", "facts_agg")
      .select($"g", $"n", round($"total", 6).as("total"))
      .as[(String, Long, Double)].collect().toSet
    def recompute = cat.read("silver", "facts")
      .groupBy($"g").agg(count(lit(1)).as("n"),
        round(sum($"v"), 6).as("total"))
      .as[(String, Long, Double)].collect().toSet

    // batch 1 seeds silver AND gold from the full aggregate
    mem.addData((1L, "a", 10.0, 1L), (2L, "a", 20.0, 1L), (3L, "b", 5.0, 1L))
    run()
    assert(goldNow === Set(("a", 2L, 30.0), ("b", 1L, 5.0)))
    assert(goldNow === recompute)

    // batch 2 (new run, same checkpoint — restart path): update k=2,
    // insert k=4 into a NEW group, plus an intra-batch stale duplicate
    mem.addData((2L, "a", 25.0, 2L), (4L, "c", 7.0, 2L), (4L, "c", 99.0, 1L))
    run()
    assert(goldNow === Set(("a", 2L, 35.0), ("b", 1L, 5.0), ("c", 1L, 7.0)))
    assert(goldNow === recompute)

    // batch 3: update that MOVES a row across groups (b → a): the delta
    // must subtract from b (emptying it) and add to a
    mem.addData((3L, "a", 6.0, 3L))
    run()
    assert(goldNow === Set(("a", 3L, 41.0), ("c", 1L, 7.0))) // b vanished
    assert(goldNow === recompute)
  }

  test("incremental gold sink: crash between merge and gold apply recovers exactly-once") {
    implicit val sq = spark.sqlContext
    // extra retention: recovery diffs from the APPLIED watermark, which can
    // trail the head by the crashed commit plus its replay
    val cat = new graft.catalog.TableCatalog(spark, tmpDir("ivm-crash"),
      keepVersions = 4)
    val chk = tmpDir("ivm-crash-chk")
    val mem = MemoryStream[(Long, String, Double, Long)]
    def run(): Unit = SilverJob.startIncrementalGoldSink(
      mem.toDF().toDF("k", "g", "v", "rev"), cat, "silver", "facts",
      keys = Seq("k"), orderCol = "rev",
      goldLayer = "gold", goldTable = "agg", groupCols = Seq("g"),
      valueCol = "v", checkpoint = chk).awaitTermination()

    mem.addData((1L, "a", 10.0, 1L), (2L, "b", 20.0, 1L))
    run() // seed: silver v1, gold applied_src_version = 1

    // CRASH SIMULATION: the batch's merge committed to silver but the
    // process died before the gold apply — silver advances, gold and its
    // watermark stay stale
    val batch2 = Seq((2L, "b", 25.0, 2L), (3L, "c", 7.0, 2L))
    cat.merge(batch2.toDF("k", "g", "v", "rev"), "silver", "facts",
      keys = Seq("k"), precedence = Some("rev"))
    assert(cat.readTag("gold", "agg", "applied_src_version") === Some("1"))

    // recovery: the offset log replays the same batch; the sink's merge
    // re-commits idempotently and the feed spans BOTH commits from the
    // stale watermark — the delta lands exactly once
    mem.addData(batch2: _*)
    run()
    val gold = cat.read("gold", "agg")
      .select($"g", $"n", round($"total", 6).as("total"))
      .as[(String, Long, Double)].collect().toSet
    val recompute = cat.read("silver", "facts")
      .groupBy($"g").agg(count(lit(1)).as("n"), round(sum($"v"), 6).as("total"))
      .as[(String, Long, Double)].collect().toSet
    assert(gold === recompute)
    assert(gold === Set(("a", 1L, 10.0), ("b", 1L, 25.0), ("c", 1L, 7.0)))
    // watermark caught up to the silver head
    assert(cat.readTag("gold", "agg", "applied_src_version") ===
      Some(cat.currentVersion("silver", "facts").get.toString))
  }

  test("ST3: two concurrent queries coordinated via awaitAnyTermination") {
    implicit val sq = spark.sqlContext
    spark.streams.resetTerminated()
    val fires = MemoryStream[String]
    val weather = MemoryStream[String]
    fires.addData(fireJson(28.29, 1.7e9))
    weather.addData(fireJson(1.0, 1.7e9)) // shape irrelevant; just a value row
    val q1 = SilverJob.fireSilver(fires.toDF().select($"value"))
      .writeStream.format("memory").queryName("st3_a")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    val q2 = weather.toDF().select($"value")
      .writeStream.format("memory").queryName("st3_b")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    // the reference's fire_risk_processor.py:89 coordination surface
    assert(spark.streams.awaitAnyTermination(60000L))
    q1.awaitTermination(); q2.awaitTermination()
    assert(spark.table("st3_a").count() === 1)
    assert(spark.table("st3_b").count() === 1)
  }

  test("streaming near-dup: incremental LSH probe per micro-batch via foreachBatch") {
    implicit val sq = spark.sqlContext
    // static corpus indexed ONCE (at scale: written bucketed tables)
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "completely different content about distributed query engines and shuffles")
    ).toDF("doc_id", "text")
    val index = graft.operators.Dedup.minhashLshIndex(corpus, n = 3)
      .localCheckpoint(true)
    val store = graft.operators.Dedup.minhashLshShingleStore(corpus, n = 3)
      .localCheckpoint(true)
    val hits = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val mem = MemoryStream[(Long, String)]
    mem.addData(
      (100L, "the quick brown fox jumps over the lazy cat near the river bank today"),
      (101L, "novel text with no counterpart in the indexed corpus whatsoever here"))
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .outputMode("append").trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val found = graft.operators.Dedup
          .minhashLshProbe(batch, index, store, n = 3, threshold = 0.5)
          .select($"doc1", $"doc2").as[(Long, Long)].collect()
        hits.synchronized { hits ++= found }
        ()
      }.start()
    q.awaitTermination()
    assert(hits.toSet === Set((100L, 1L)))
  }

  test("ST7: gap sessionization via flatMapGroupsWithState") {
    implicit val s = spark
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Sessionize.Event]
    def ev(key: String, sec: Long, v: Double) =
      Sessionize.Event(key, new Timestamp(sec * 1000), v)
    // key a: events at 1000,1010 (one session), then 1100 (second session);
    // key b's much-later event drives the watermark far enough that the
    // AvailableNow timeout pass closes both. NB: timestamps must sit well
    // above epoch 0 — the initial watermark IS 0 and drops rows at it.
    mem.addData(ev("a", 1000, 1.0), ev("a", 1010, 2.0), ev("a", 1100, 5.0),
      ev("b", 1500, 9.0))
    val sessions = Sessionize.sessions(mem.toDS(), gapMs = 30000L)
    val q = sessions.writeStream.format("memory").queryName("sess_sink")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("sess_sink").orderBy($"start").as[Sessionize.Session].collect()
    // first session of "a" closed by gap AND past watermark (500s - 30s)
    assert(got.exists(s => s.key == "a" && s.n_events == 2 && s.total_value == 3.0))
    assert(got.exists(s => s.key == "a" && s.n_events == 1 && s.total_value == 5.0))
  }

  test("ST7: a late event BRIDGES two open intervals into one session") {
    implicit val s = spark
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Sessionize.Event]
    def ev(key: String, sec: Long, v: Double) =
      Sessionize.Event(key, new Timestamp(sec * 1000), v)
    val q = Sessionize.sessions(mem.toDS(), gapMs = 30000L)
      .writeStream.format("memory").queryName("sess_bridge_sink")
      .outputMode("append").start()
    mem.addData(ev("a", 1000, 1.0), ev("a", 1050, 2.0)) // two intervals, 50s apart
    q.processAllAvailable()
    mem.addData(ev("a", 1025, 4.0)) // admissible (wm=1020), within gap of BOTH
    q.processAllAvailable()
    mem.addData(ev("b", 3000, 9.0)) // drive watermark past the merged close
    q.processAllAvailable()
    mem.addData(ev("b", 3001, 1.0)) // extra batch so the timeout pass runs
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess_bridge_sink").as[Sessionize.Session].collect()
      .filter(_.key == "a")
    assert(got.length === 1, got.mkString(","))
    assert(got.head.start.getTime === 1000000L && got.head.end.getTime === 1050000L)
    assert(got.head.n_events === 3 && got.head.total_value === 7.0)
  }

  test("ST7: distant out-of-order event stays a separate session (no gluing)") {
    implicit val s = spark
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Sessionize.Event]
    def ev(key: String, sec: Long, v: Double) =
      Sessionize.Event(key, new Timestamp(sec * 1000), v)
    val q = Sessionize.sessions(mem.toDS(), gapMs = 30000L)
      .writeStream.format("memory").queryName("sess_sep_sink")
      .outputMode("append").start()
    mem.addData(ev("a", 1000, 1.0), ev("a", 1200, 2.0)) // 200s apart: two intervals
    q.processAllAvailable()
    mem.addData(ev("a", 1185, 4.0)) // admissible (wm=1170); near 1200 ONLY
    q.processAllAvailable()
    mem.addData(ev("b", 3000, 9.0))
    q.processAllAvailable()
    mem.addData(ev("b", 3001, 1.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess_sep_sink").as[Sessionize.Session].collect()
      .filter(_.key == "a").sortBy(_.start.getTime)
    assert(got.length === 2, got.mkString(","))
    assert(got(0).start.getTime === 1000000L && got(0).n_events === 1)
    assert(got(1).start.getTime === 1185000L && got(1).end.getTime === 1200000L
      && got(1).n_events === 2 && got(1).total_value === 6.0)
  }

  test("ST7: watermark-admissible late event extends the session start backwards") {
    implicit val s = spark
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Sessionize.Event]
    def ev(key: String, sec: Long, v: Double) =
      Sessionize.Event(key, new Timestamp(sec * 1000), v)
    val sessions = Sessionize.sessions(mem.toDS(), gapMs = 30000L)
    val q = sessions.writeStream.format("memory").queryName("sess_late_sink")
      .outputMode("append").start()
    mem.addData(ev("a", 2000, 1.0))
    q.processAllAvailable() // watermark → 1970
    mem.addData(ev("a", 1990, 2.0)) // late but admissible AND within gap
    q.processAllAvailable()
    mem.addData(ev("b", 3000, 9.0)) // drive watermark past a's timeout
    q.processAllAvailable()
    mem.addData(ev("b", 3001, 1.0)) // extra batch so the timeout pass runs
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess_late_sink").as[Sessionize.Session].collect()
    val a = got.find(_.key == "a").getOrElse(fail(s"no session for a: ${got.mkString(",")}"))
    assert(a.start.getTime === 1990000L, a) // NOT 2000000 — late event lowered it
    assert(a.end.getTime === 2000000L, a)
    assert(a.n_events === 2 && a.total_value === 3.0, a)
  }

  /** Run `body` with the streaming state store pinned to RocksDB (the
    * 100 TB-viable provider: state spills to local SST files instead of
    * the executor heap, with changelog checkpointing so each commit
    * uploads a delta, not a full snapshot). The provider is a session
    * conf read at QUERY START, so setting it here covers exactly the
    * queries `body` starts; restored after.
    */
  private def underRocksDB[A](body: => A): A = {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val changelogKey =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val prev = spark.conf.getOption(providerKey)
    val prevCl = spark.conf.getOption(changelogKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(changelogKey, "true")
    try body finally {
      prev.fold(spark.conf.unset(providerKey))(spark.conf.set(providerKey, _))
      prevCl.fold(spark.conf.unset(changelogKey))(spark.conf.set(changelogKey, _))
    }
  }

  test("Kafka-shaped contract: silver topology over a rate source in the Kafka wire schema") {
    // S1's production source is format("kafka") — no connector jar ships
    // offline, so this pins the next-best thing: a LIVE non-file source
    // (rate) mapped to the Kafka WIRE SCHEMA (binary key/value +
    // topic/partition/offset/timestamp), pushed through the SAME
    // projection the Kafka branch uses (ValueStream.fromKafkaRows) and
    // the SAME Silver parse path. Proves the topology is source-agnostic:
    // plugging the real connector in changes only the DataStreamReader.
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", "100").load()
    val kafkaShaped = rate.select(
      lit(null).cast("binary").as("key"),
      encode(format_string(
        """{"source":"NASA_VIIRS","region":"canarias","lat":%.2f,""" +
          """"lon":-16.5,"temp_k":350.0,"confidence":"h","timestamp":%d}""",
        lit(28.0) + col("value") * 0.01, lit(1700000000L) + col("value")),
        "UTF-8").as("value"),
      lit("fires").as("topic"), lit(0).as("partition"),
      col("value").as("offset"), col("timestamp"))
    val silver = SilverJob.fireSilver(ValueStream.fromKafkaRows(kafkaShaped))
    val q = silver.writeStream.format("memory").queryName("kafka_shape_sink")
      .outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      var n = 0L
      while (n == 0 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        n = spark.table("kafka_shape_sink").count()
        if (n == 0) Thread.sleep(200)
      }
      assert(n > 0, "rate-fed Kafka-shaped stream produced no silver rows")
      val row = spark.table("kafka_shape_sink")
        .select($"region", $"confidence", $"lat").head()
      assert(row.getString(0) === "canarias")
      assert(row.getString(1) === "h")
      assert(row.getDouble(2) >= 28.0)
    } finally q.stop()
  }

  test("stream-stream interval join is green under RocksDB state store") {
    underRocksDB {
      implicit val sq = spark.sqlContext
      val fires = MemoryStream[String]
      val weather = MemoryStream[(String, Double, Double)]
      fires.addData(fireJson(28.29, 1.7e9 + 100), fireJson(28.60, 1.7e9 + 5000))
      weather.addData(("canarias", 42.0, 1.7e9 + 80),
        ("canarias", 10.0, 1.7e9 + 4000))
      val f = SilverJob.withEventTime(
        SilverJob.fireSilver(fires.toDF().select($"value")))
        .select($"lat", $"region", $"event_ts".as("fire_ts"))
      val w = weather.toDF().toDF("wregion", "wind", "wts")
        .withColumn("weather_ts", timestamp_seconds($"wts"))
        .withWatermark("weather_ts", "10 minutes")
      val joined = f.join(w,
        $"region" === $"wregion" &&
          $"weather_ts".between(
            $"fire_ts" - expr("INTERVAL 5 MINUTES"), $"fire_ts"))
      val q = joined.writeStream.format("memory").queryName("ssj_rocks_sink")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val rows = spark.table("ssj_rocks_sink").select($"lat", $"wind")
        .as[(Double, Double)].collect().toSet
      // identical result to the heap-provider twin test above
      assert(rows === Set((28.29, 42.0)))
    }
  }

  test("ST7: sessionization is green under RocksDB state store") {
    underRocksDB {
      implicit val s = spark
      implicit val sq = spark.sqlContext
      val mem = MemoryStream[Sessionize.Event]
      def ev(key: String, sec: Long, v: Double) =
        Sessionize.Event(key, new Timestamp(sec * 1000), v)
      mem.addData(ev("a", 1000, 1.0), ev("a", 1010, 2.0), ev("a", 1100, 5.0),
        ev("b", 1500, 9.0))
      val sessions = Sessionize.sessions(mem.toDS(), gapMs = 30000L)
      val q = sessions.writeStream.format("memory").queryName("sess_rocks_sink")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = spark.table("sess_rocks_sink").orderBy($"start")
        .as[Sessionize.Session].collect()
      // identical sessions to the heap-provider twin test above
      assert(got.exists(s => s.key == "a" && s.n_events == 2 && s.total_value == 3.0))
      assert(got.exists(s => s.key == "a" && s.n_events == 1 && s.total_value == 5.0))
    }
  }
}
