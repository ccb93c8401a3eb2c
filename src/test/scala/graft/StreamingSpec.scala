package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingRecency
import graft.streaming.StreamingRecency.NewsEvent

/** Drives the streaming recency operators through real micro-batches
  * (MemoryStream → memory sink), asserting watermark finalization and
  * stateful-latest semantics.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ev(key: String, t: String, h: String) =
    NewsEvent(key, java.sql.Timestamp.valueOf(t), h)

  test("windowedLatest: append emits a window once its watermark passes; max_by wins") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[NewsEvent]
    val q = StreamingRecency.windowedLatest(input.toDF(), "key", "ts", "headline")
      .writeStream.format("memory").queryName("wl").outputMode("append").start()
    try {
      input.addData(
        ev("A", "2024-01-01 10:05:00", "early"),
        ev("A", "2024-01-01 10:20:00", "latest-in-window"),
        ev("B", "2024-01-01 10:30:00", "only-b"))
      q.processAllAvailable()
      assert(spark.table("wl").count() == 0) // watermark 10:10 < window end 11:00

      input.addData(ev("A", "2024-01-01 12:00:00", "advances-watermark"))
      q.processAllAvailable()
      input.addData(ev("A", "2024-01-01 12:01:00", "tick")) // extra batch flushes finalized state
      q.processAllAvailable()

      val out = spark.table("wl")
        .filter($"window_start" === java.sql.Timestamp.valueOf("2024-01-01 10:00:00"))
        .collect().map(r => r.getString(0) -> r.getString(3)).toMap
      assert(out == Map("A" -> "latest-in-window", "B" -> "only-b"))
    } finally q.stop()
  }

  test("streaming OHLC bars finalize per window and match the batch aggregate") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp, Double, Long)]
    def tick(k: String, ts: String, v: Double, id: Long) =
      (k, java.sql.Timestamp.valueOf(ts), v, id)
    val src = input.toDF().toDF("k", "ts", "v", "id")
    val q = graft.streaming.StreamingBars
      .bars(src, "k", "ts", "v", "id", "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("bars").outputMode("append").start()
    try {
      val ticks = Seq(
        tick("A", "2024-01-01 10:05:00", 100.0, 1),
        tick("A", "2024-01-01 10:05:00", 99.0, 0),   // same ts: id breaks the open tie
        tick("A", "2024-01-01 10:40:00", 105.0, 2),
        tick("A", "2024-01-01 10:50:00", 103.0, 3))
      input.addData(ticks: _*)
      q.processAllAvailable()
      input.addData(tick("A", "2024-01-01 12:30:00", 1.0, 9)) // advance watermark
      q.processAllAvailable()
      input.addData(tick("A", "2024-01-01 12:31:00", 1.0, 10))
      q.processAllAvailable()
      val bar = spark.table("bars")
        .filter($"bar_start" === java.sql.Timestamp.valueOf("2024-01-01 10:00:00"))
        .collect()(0)
      assert(bar.getDouble(2) == 99.0)   // open: lower id at the tied ts
      assert(bar.getDouble(3) == 105.0 && bar.getDouble(4) == 99.0)
      assert(bar.getDouble(5) == 103.0 && bar.getLong(6) == 4L)
      // the batch shadow over the same rows produces the identical bar
      val batch = graft.streaming.StreamingBars.barsAgg(
          ticks.toDF("k", "ts", "v", "id"), "k", "ts", "v", "id", "1 hour")
        .collect()(0)
      assert(batch.toSeq.drop(2) == bar.toSeq.drop(2))
    } finally q.stop()
  }

  test("runningLatest: mapGroupsWithState keeps the per-key latest across batches") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[NewsEvent]
    val q = StreamingRecency.runningLatest(input.toDS())
      .writeStream.format("memory").queryName("rl").outputMode("update").start()
    try {
      input.addData(ev("A", "2024-01-01 10:00:00", "first"))
      q.processAllAvailable()
      input.addData(
        ev("A", "2024-01-01 09:00:00", "older-must-not-win"),
        ev("B", "2024-01-01 11:00:00", "b1"))
      q.processAllAvailable()
      // last update per key wins in the memory sink's update log
      val latest = spark.table("rl").collect()
        .groupBy(_.getString(0))
        .map { case (k, rows) => k -> rows.maxBy(_.getTimestamp(1).getTime).getString(2) }
      assert(latest == Map("A" -> "first", "B" -> "b1")) // state retained the newer A
    } finally q.stop()
  }

  test("streamIntervalJoin: joins within (m_ts - lookback, m_ts], drops outside") {
    implicit val ctx = spark.sqlContext
    val market = MemoryStream[NewsEvent] // (key, ts, headline≈event id)
    val news = MemoryStream[NewsEvent]
    val joined = graft.streaming.StreamingJoin.streamIntervalJoin(
      market.toDF().selectExpr("key AS m_key", "ts AS m_ts", "headline AS m_id"),
      news.toDF().selectExpr("key AS n_key", "ts AS n_ts", "headline AS n_id"),
      "m_key", "n_key", "m_ts", "n_ts", "2 hours", watermark = "1 minute")
    val q = joined.writeStream.format("memory").queryName("sj")
      .outputMode("append").start()
    try {
      news.addData(ev("A", "2024-01-01 10:00:00", "n1"))
      market.addData(
        ev("A", "2024-01-01 11:00:00", "m-in"),      // n_ts within (09:00, 11:00]
        ev("A", "2024-01-01 13:00:00", "m-too-late"), // n_ts ≤ m_ts−2h → out
        ev("A", "2024-01-01 09:30:00", "m-before"),   // n_ts > m_ts → out
        ev("B", "2024-01-01 10:30:00", "m-wrong-key"))
      q.processAllAvailable()
      // advance both watermarks so buffered state flushes
      market.addData(ev("A", "2024-01-02 00:00:00", "m-tick"))
      news.addData(ev("A", "2024-01-02 00:00:00", "n-tick"))
      q.processAllAvailable()
      val got = spark.table("sj").collect()
        .map(r => r.getAs[String]("m_id") -> r.getAs[String]("n_id")).toSet
      assert(got.filter(_._2 == "n1") == Set("m-in" -> "n1"))
    } finally q.stop()
  }

  test("thresholdAlerts: flatMapGroupsWithState emits only threshold crossings") {
    import graft.streaming.StreamingAlerts
    import graft.streaming.StreamingAlerts.Tick
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Tick]
    def tick(k: String, t: String, v: Double) =
      Tick(k, java.sql.Timestamp.valueOf(t), v)
    val q = StreamingAlerts.thresholdAlerts(input.toDS(), thresholdPct = 10.0)
      .writeStream.format("memory").queryName("al").outputMode("append").start()
    try {
      input.addData(
        tick("A", "2024-01-01 10:00:00", 100.0), // arms baseline, no alert
        tick("A", "2024-01-01 10:01:00", 105.0), // +5% — silent
        tick("A", "2024-01-01 10:02:00", 112.0)) // +12% vs 100 — alert, re-arm
      q.processAllAvailable()
      input.addData(
        tick("A", "2024-01-01 10:03:00", 113.0), // +0.9% vs 112 — silent (state held)
        tick("A", "2024-01-01 10:04:00", 90.0))  // -19.6% vs 112 — alert
      q.processAllAvailable()
      val alerts = spark.table("al").collect()
        .map(r => (r.getTimestamp(1).toString.substring(11, 19), r.getDouble(2)))
        .sortBy(_._1)
      assert(alerts.toSeq == Seq(("10:02:00", 112.0), ("10:04:00", 90.0)))
    } finally q.stop()
  }

  test("admitUpTo: per-source quota admits first arrivals only, state carried across batches") {
    import graft.streaming.StreamingQuota
    import graft.streaming.StreamingQuota.Doc
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Doc]
    def d(src: String, id: Long, t: String) =
      Doc(src, id, java.sql.Timestamp.valueOf(t))
    val q = StreamingQuota.admitUpTo(input.toDS(), quota = 2)
      .writeStream.format("memory").queryName("quo").outputMode("append").start()
    try {
      input.addData(
        d("A", 11L, "2024-01-01 10:00:02"), // arrives 2nd by ts -> rank 2
        d("A", 10L, "2024-01-01 10:00:01"), // arrives 1st -> rank 1
        d("B", 20L, "2024-01-01 10:00:00"))
      q.processAllAvailable()               // A at quota; B has 1 slot left
      input.addData(
        d("A", 12L, "2024-01-01 10:00:03"), // over quota — suppressed
        d("B", 21L, "2024-01-01 10:00:04"), // rank 2
        d("B", 22L, "2024-01-01 10:00:05")) // over quota — suppressed
      q.processAllAvailable()
      val got = spark.table("quo").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(3))).sorted.toSeq
      assert(got == Seq(("A", 10L, 1), ("A", 11L, 2), ("B", 20L, 1), ("B", 21L, 2)))
    } finally q.stop()
  }

  test("admitScan: batch twin ranks by (ts, id) with the timestamp riding the score exactly") {
    import spark.implicits._
    val rows = Seq(
      ("A", 1L, "2024-01-01 10:00:01"),
      ("A", 2L, "2024-01-01 10:00:01"), // ts tie -> id order
      ("A", 3L, "2024-01-01 10:00:00"),
      ("B", 9L, "2024-01-01 11:00:00")
    ).map { case (s, i, t) => (s, i, java.sql.Timestamp.valueOf(t)) }
      .toDF("source", "doc_id", "ts")
    val got = graft.streaming.StreamingQuota
      .admitScan(rows, "source", "doc_id", "ts", quota = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getTimestamp(2), r.getInt(3)))
      .sortBy(x => (x._1, x._4))
    assert(got.map(x => (x._1, x._2, x._4)).toSeq ==
      Seq(("A", 3L, 1), ("A", 1L, 2), ("B", 9L, 1)))
    // reconstructed timestamps are bit-exact round-trips
    assert(got.forall { case (_, id, ts, _) =>
      rows.collect().exists(r => r.getLong(1) == id && r.getTimestamp(2) == ts) })
  }

  test("firstSeenParagraphs: a paragraph admits once corpus-wide, state carried across batches") {
    import graft.streaming.StreamingParagraphDedup
    import graft.streaming.StreamingParagraphDedup.ParaIn
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[ParaIn]
    def p(doc: Long, pos: Long, hash: String, t: String) =
      ParaIn(doc, pos, hash, java.sql.Timestamp.valueOf(t))
    val q = StreamingParagraphDedup.firstSeenParagraphs(input.toDS())
      .writeStream.format("memory").queryName("fsp").outputMode("append").start()
    try {
      input.addData(
        p(2L, 0L, "hA", "2024-01-01 10:00:05"), // later ts — loses to doc 1's copy
        p(1L, 0L, "hA", "2024-01-01 10:00:01"), // first arrival of hA -> kept
        p(1L, 1L, "hB", "2024-01-01 10:00:01"))
      q.processAllAvailable()
      input.addData(
        p(3L, 0L, "hA", "2024-01-01 10:00:00"), // EARLIER ts but later batch: suppressed (arrival order)
        p(3L, 1L, "hC", "2024-01-01 10:00:09"))
      q.processAllAvailable()
      val kept = spark.table("fsp").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getBoolean(3))).sorted.toSeq
      assert(kept == Seq(("hA", 1L, true), ("hA", 2L, false), ("hA", 3L, false),
        ("hB", 1L, true), ("hC", 3L, true)))
    } finally q.stop()
  }

  test("firstSeenParagraphScan: min-(ts, doc, pos) admission and reassembly match the streamed replay") {
    import graft.streaming.StreamingParagraphDedup
    // 4-token docs at blockTokens=2 -> two paragraphs each; doc 11
    // re-crawls doc 1's first paragraph at a later ts
    val rows = Seq(
      (1L, "a b c d", "2024-01-01 10:00:01"),
      (11L, "a b x y", "2024-01-01 10:00:02")
    ).map { case (i, t, ts) => (i, t, java.sql.Timestamp.valueOf(ts)) }
      .toDF("doc_id", "text", "ts")
    val got = StreamingParagraphDedup
      .firstSeenParagraphScan(rows, "doc_id",
        org.apache.spark.sql.functions.col("text"), "ts", blockTokens = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    assert(got == Seq((1L, 2L, 2L, "a b c d"), (11L, 2L, 1L, "x y")))
  }

  test("standing-query matcher: frozen-stats scoring on a live stream, threshold cut") {
    import graft.streaming.StreamingMatcher
    implicit val ctx = spark.sqlContext
    val cal = Seq(
      (1L, "spark spark jobs run fast", "2024-01-01 10:00:01"),
      (2L, "the window closed on the stream", "2024-01-01 10:00:02"),
      (3L, "nothing relevant here at all today", "2024-01-01 10:00:03"),
      (4L, "spark stream window spark", "2024-01-01 10:00:04")
    ).map { case (i, t, ts) => (i, t, java.sql.Timestamp.valueOf(ts)) }
      .toDF("doc_id", "text", "ts")
    val terms = Seq("spark", "stream", "window")
    val stats = StreamingMatcher.calibrate(cal, "text", terms)
    assert(stats.nDocs == 4 && stats.dfByTerm("spark") == 2)
    // batch twin over the snapshot == the frozen-stats map over it
    val scan = StreamingMatcher.matchScan(cal, "doc_id", "text", "ts",
        terms, 1.2, 0.75, thresholdU = 1L)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scan.keySet == Set(1L, 2L, 4L)) // doc 3 has no terms -> score 0
    assert(scan(4L) > scan(1L))            // 3 distinct terms beat 2x one term
    // live stream: same scores from the SAME frozen stats, including a
    // post-calibration arrival (doc 9 scored with df frozen at 4 docs)
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = StreamingMatcher.matches(
        input.toDS().toDF("doc_id", "text", "ts"),
        "doc_id", "text", "ts", stats, terms, 1.2, 0.75, thresholdU = 1L)
      .writeStream.format("memory").queryName("sqm").outputMode("append").start()
    try {
      input.addData(
        (1L, "spark spark jobs run fast", java.sql.Timestamp.valueOf("2024-01-01 10:00:01")),
        (3L, "nothing relevant here at all today", java.sql.Timestamp.valueOf("2024-01-01 10:00:03")))
      q.processAllAvailable()
      input.addData(
        (9L, "spark stream window spark", java.sql.Timestamp.valueOf("2024-01-01 11:00:00")))
      q.processAllAvailable()
      val live = spark.table("sqm").collect()
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(live.keySet == Set(1L, 9L))   // doc 3 filtered, doc 9 matched live
      assert(live(1L) == scan(1L))         // replayed snapshot row scores identically
      assert(live(9L) == scan(4L))         // same text as doc 4 -> same frozen score
    } finally q.stop()
  }

  test("bloom screen: stateless stream-static joins verdict live docs in append mode") {
    import graft.streaming.StreamingBloom
    import graft.operators.Dedup
    implicit val ctx = spark.sqlContext
    val base = (1 to 50).map(i => (i.toLong, s"base doc number $i with words"))
      .toDF("doc_id", "text")
    val nWords = Dedup.BloomWords.toLong
    // static filter table, built once — the index job's artifact
    val filter = Dedup.bloomBitsFrame(base, "text", nWords)
      .localCheckpoint(eager = true)
    val input = MemoryStream[(Long, String)]
    val q = StreamingBloom.screen(input.toDS().toDF("doc_id", "text"),
        "doc_id", "text", filter, nWords)
      .writeStream.format("memory").queryName("bloomscr")
      .outputMode("append").start()
    try {
      // batch 1: one known member, one novel
      input.addData((1001L, "base doc number 7 with words"),
        (1002L, "a certified novel document"))
      q.processAllAvailable()
      // batch 2: membership verdicts need NO carried state — a repeat
      // of batch 1's novel text still misses, another member still hits
      input.addData((1003L, "base doc number 50 with words"),
        (1004L, "a certified novel document"))
      q.processAllAvailable()
      val out = spark.table("bloomscr").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(out == Map(1001L -> true, 1002L -> false,
        1003L -> true, 1004L -> false))
      // and the live verdicts equal the batch stateless form's
      val batchForm = Dedup.bloomMaybeContainsJoinStateless(
          Seq((1001L, "base doc number 7 with words"),
            (1002L, "a certified novel document"),
            (1003L, "base doc number 50 with words"),
            (1004L, "a certified novel document")).toDF("doc_id", "text"),
          "doc_id", "text", filter, nWords)
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(out == batchForm)
    } finally q.stop()
  }

  test("video screen: stateless stream-static frame probe against the standing postings") {
    import graft.streaming.StreamingVideoScreen
    import graft.operators.Multimodal
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-vidscr").toString
    val base = Seq((1L, "a b c d"), (2L, "c d e f"), (3L, "g h"))
      .toDF("doc_id", "text")
    Multimodal.writeFrameSigIndex(
      Multimodal.frameSignatures(Multimodal.attachVideoPayload(base, 2)),
      dir, blockTokens = 2, dfCap = 10)
    val postings = spark.read.parquet(s"$dir/postings")
      .select("doc_id", "frame_sig").localCheckpoint(eager = true)
    val input = MemoryStream[(Long, String)]
    val q = StreamingVideoScreen.screen(
        Multimodal.attachVideoPayload(
          input.toDS().toDF("doc_id", "text"), blockTokens = 2), postings)
      .writeStream.format("memory").queryName("vidscr")
      .outputMode("append").start()
    try {
      // batch 1: one clip sharing "c d" with docs 1 AND 2, one novel
      input.addData((100L, "c d"), (101L, "zz qq"))
      q.processAllAvailable()
      // batch 2: same content under a new id — verdicts carry NO state
      input.addData((102L, "c d"))
      q.processAllAvailable()
      val out = spark.table("vidscr").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(out == Set((100L, 0, 1L), (100L, 0, 2L),
        (102L, 0, 1L), (102L, 0, 2L)))
    } finally q.stop()
  }

  test("audio segments: stateless per-row fold segments live uploads in append mode") {
    import graft.streaming.StreamingAudioSegments
    implicit val ctx = spark.sqlContext
    // window 0: 16×0xff (energy 4080, speech); window 1: 16×0x00
    // (energy 0, silent); window 2: speech again — three maximal runs
    val loud = Array.fill[Byte](16)(-1)
    val quiet = new Array[Byte](16)
    val p1 = loud ++ quiet ++ loud
    val p2 = quiet ++ quiet           // one silent run spanning both
    val input = MemoryStream[(Long, Array[Byte])]
    val q = StreamingAudioSegments.segments(
        input.toDS().toDF("doc_id", "payload"), threshold = 2048L)
      .writeStream.format("memory").queryName("audioseg")
      .outputMode("append").start()
    try {
      input.addData((1L, p1))
      q.processAllAvailable()
      // batch 2 needs NO carried state: a repeat of doc 1's payload
      // under a new id segments identically
      input.addData((2L, p2), (3L, p1))
      q.processAllAvailable()
      val out = spark.table("audioseg").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2),
          r.getInt(3), r.getLong(4), r.getLong(5))).toSet
      val p1Segs = (id: Long) => Set(
        (id, 1, true, 0, 1L, 4080L),
        (id, 2, false, 1, 1L, 0L),
        (id, 3, true, 2, 1L, 4080L))
      assert(out == p1Segs(1L) ++ p1Segs(3L) + ((2L, 1, false, 0, 2L, 0L)))
    } finally q.stop()
  }

  test("occurrenceWeights: 1/arrival-rank per hash, count state carried across batches") {
    import graft.streaming.StreamingSoftWeights
    import graft.streaming.StreamingSoftWeights.DocIn
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[DocIn]
    def d(doc: Long, hash: String, t: String) =
      DocIn(doc, hash, java.sql.Timestamp.valueOf(t))
    val q = StreamingSoftWeights.occurrenceWeights(input.toDS())
      .writeStream.format("memory").queryName("osw").outputMode("append").start()
    try {
      input.addData(
        d(2L, "hA", "2024-01-01 10:00:05"), // later ts — ranks AFTER doc 1 in-batch
        d(1L, "hA", "2024-01-01 10:00:01"),
        d(1L, "hB", "2024-01-01 10:00:01"))
      q.processAllAvailable()
      input.addData(
        d(3L, "hA", "2024-01-01 10:00:00")) // earlier ts, later batch: rank 3 (arrival order)
      q.processAllAvailable()
      val got = spark.table("osw").collect()
        .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getDouble(3)))
        .sorted.toSeq
      assert(got == Seq(
        ("hA", 1L, 1L, 1.0), ("hA", 2L, 2L, 0.5),
        ("hA", 3L, 3L, graft.operators.Rounding.stableVal(1.0 / 3, 6)),
        ("hB", 1L, 1L, 1.0)))
    } finally q.stop()
  }

  test("occurrenceWeightScan: (ts, doc) arrival rank matches the streamed replay") {
    import graft.streaming.StreamingSoftWeights
    val rows = Seq(
      (1L, "same text", "2024-01-01 10:00:01"),
      (2L, "same text", "2024-01-01 10:00:05"),
      (3L, "same text", "2024-01-01 10:00:03"),
      (4L, "other", "2024-01-01 10:00:02")
    ).map { case (i, t, ts) => (i, t, java.sql.Timestamp.valueOf(ts)) }
      .toDF("doc_id", "text", "ts")
    val got = StreamingSoftWeights.occurrenceWeightScan(rows, "doc_id",
        org.apache.spark.sql.functions.col("text"), "ts")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // ts order ranks doc 3 ahead of doc 2 despite the lower doc_id
    assert(got(1L) == ((1L, 1.0)))
    assert(got(3L) == ((2L, 0.5)))
    assert(got(2L) == ((3L, graft.operators.Rounding.stableVal(1.0 / 3, 6))))
    assert(got(4L) == ((1L, 1.0)))
  }

  test("firstSeenFingerprints: a fingerprint deposits once, later arrivals read seen_before") {
    import graft.streaming.StreamingWinnow
    import graft.streaming.StreamingWinnow.FpIn
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[FpIn]
    def f(doc: Long, fp: Long, t: String) =
      FpIn(doc, fp, java.sql.Timestamp.valueOf(t))
    val q = StreamingWinnow.firstSeenFingerprints(input.toDS())
      .writeStream.format("memory").queryName("fsw").outputMode("append").start()
    try {
      input.addData(
        f(2L, 7L, "2024-01-01 10:00:05"), // later ts in SAME batch — not the owner
        f(1L, 7L, "2024-01-01 10:00:01"),
        f(1L, 9L, "2024-01-01 10:00:01"))
      q.processAllAvailable()
      input.addData(
        f(3L, 7L, "2024-01-01 10:00:00"), // earlier ts, LATER batch: still shared (arrival order)
        f(3L, 5L, "2024-01-01 10:00:09"))
      q.processAllAvailable()
      val got = spark.table("fsw").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted.toSeq
      assert(got == Seq((5L, 3L, false), (7L, 1L, false), (7L, 2L, true),
        (7L, 3L, true), (9L, 1L, false)))
    } finally q.stop()
  }

  test("winnowContaminationScan: first-arrival ownership matches the streamed replay's rollup") {
    import graft.streaming.StreamingWinnow
    import graft.streaming.StreamingWinnow.FpIn
    import org.apache.spark.sql.functions._
    // doc 1 arrives first; doc 11 embeds doc 1's opening substring
    // (>= w + k - 1 = 8 chars) so it MUST share a fingerprint; doc 20 is
    // disjoint text
    val rows = Seq(
      (1L, "the quick brown fox jumps", "2024-01-01 10:00:01"),
      (11L, "the quick brown dog sleeps", "2024-01-01 10:00:02"),
      (20L, "zzzz yyyy xxxx wwww vvvv", "2024-01-01 10:00:03")
    ).map { case (i, t, ts) => (i, t, java.sql.Timestamp.valueOf(ts)) }
      .toDF("doc_id", "text", "ts")
    val scan = StreamingWinnow.winnowContaminationScan(
        rows, "doc_id", "text", "ts", k = 5, w = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(scan(1L)._3 == false)            // first arrival owns everything
    assert(scan(11L)._2 >= 1L && scan(11L)._3) // shared prefix -> flagged
    assert(scan(20L)._3 == false)           // disjoint text stays clean
    // replay the same fingerprints through the streaming operator: the
    // per-doc rollup of its decisions must match the scan exactly
    implicit val ctx = spark.sqlContext
    val fpRows = graft.operators.TextAnalysis
      .winnowFrame(rows, "doc_id", "text", 5, 4, carry = Seq("ts"))
      .select(col("doc_id"), col("ts"), explode(col("__fps")).as("fp"))
      .collect().map(r => FpIn(r.getLong(0), r.getLong(2), r.getTimestamp(1)))
    val input = MemoryStream[FpIn]
    val q = StreamingWinnow.firstSeenFingerprints(input.toDS())
      .writeStream.format("memory").queryName("fsw2").outputMode("append").start()
    try {
      input.addData(fpRows.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("fsw2").collect()
        .map(r => (r.getLong(1), r.getBoolean(2)))
        .groupBy(_._1).map { case (d, xs) =>
          d -> ((xs.size.toLong, xs.count(_._2).toLong, xs.exists(_._2))) }
      assert(streamed == scan)
    } finally q.stop()
  }

  test("collisions: posting enrollment saturates at dfCap, pairs emitted vs earlier residents only") {
    import graft.streaming.StreamingContainment
    import graft.streaming.StreamingContainment.ShingleIn
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[ShingleIn]
    def sh(g: Long, doc: Long, nsh: Int, t: String) =
      ShingleIn(g, doc, nsh, java.sql.Timestamp.valueOf(t))
    val q = StreamingContainment.collisions(input.toDS(), dfCap = 2)
      .writeStream.format("memory").queryName("coll").outputMode("append").start()
    try {
      input.addData(
        sh(7L, 1L, 10, "2024-01-01 10:00:01"), // enrolls (rank 1)
        sh(7L, 2L, 4, "2024-01-01 10:00:02"))  // collides with 1, enrolls (rank 2 = cap)
      q.processAllAvailable()
      input.addData(
        sh(7L, 3L, 5, "2024-01-01 10:00:03"),  // bucket saturated: no pair, no enroll
        sh(9L, 3L, 5, "2024-01-01 10:00:03"))  // fresh bucket: enrolls alone
      q.processAllAvailable()
      val got = spark.table("coll").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getInt(4))).toSeq
      assert(got == Seq((7L, 1L, 10, 2L, 4)))
    } finally q.stop()
  }

  test("heavyHitters: milestones emitted exactly at count crossings, state carried") {
    import graft.streaming.StreamingVocab
    import graft.streaming.StreamingVocab.Tok
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Tok]
    val q = StreamingVocab.heavyHitters(input.toDS(), emitEvery = 3L)
      .writeStream.format("memory").queryName("hh").outputMode("append").start()
    try {
      input.addData(Tok("a"), Tok("a"), Tok("b"), Tok("b"), Tok("b"))
      q.processAllAvailable()       // b crosses 3; a sits at 2
      input.addData(Tok("a"), Tok("a"), Tok("a"), Tok("a"))
      q.processAllAvailable()       // a jumps 2 -> 6: milestones 3 AND 6
      val got = spark.table("hh").collect()
        .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      assert(got == Seq(("a", 3L), ("a", 6L), ("b", 3L)))
    } finally q.stop()
  }

  test("stageAdvances: strict-order funnel state across batches, no backward moves") {
    import graft.streaming.StreamingFunnel
    import graft.streaming.StreamingFunnel.Ev
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Ev]
    def e(u: Long, t: String, ts: String) = Ev(u, t, java.sql.Timestamp.valueOf(ts))
    val q = StreamingFunnel.stageAdvances(input.toDS(),
        Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName("fn").outputMode("append").start()
    try {
      input.addData(
        e(1L, "click", "2024-01-01 09:00:00"),   // click before any view: ignored
        e(1L, "view", "2024-01-01 10:00:00"),    // stage 1
        e(1L, "click", "2024-01-01 10:05:00"),   // stage 2 (same batch, ordered)
        e(2L, "view", "2024-01-01 10:00:00"))    // user 2: stage 1
      q.processAllAvailable()
      input.addData(
        e(1L, "click", "2024-01-01 10:06:00"),   // repeat step: no advance
        e(1L, "purchase", "2024-01-01 10:04:00"),// BEFORE the click: ignored
        e(1L, "purchase", "2024-01-01 10:10:00"),// stage 3
        e(2L, "purchase", "2024-01-01 11:00:00"))// user 2 skipped click: ignored
      q.processAllAvailable()
      val got = spark.table("fn").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(got == Set((1L, 1, "view"), (1L, 2, "click"), (1L, 3, "purchase"),
        (2L, 1, "view")))
    } finally q.stop()
  }

  test("stageAdvances with abandonAfter: idle funnels expire, later steps restart at 0") {
    import graft.streaming.StreamingFunnel
    import graft.streaming.StreamingFunnel.Ev
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Ev]
    def e(u: Long, t: String, ts: String) = Ev(u, t, java.sql.Timestamp.valueOf(ts))
    val q = StreamingFunnel.stageAdvances(
        input.toDS().withWatermark("ts", "0 seconds").as[Ev],
        Seq("view", "click"),
        abandonAfter = Some(java.time.Duration.ofHours(1)))
      .writeStream.format("memory").queryName("fne").outputMode("append").start()
    try {
      input.addData(e(1L, "view", "2024-01-01 10:00:00"))    // stage 1, expires 11:00
      q.processAllAvailable()
      input.addData(e(9L, "view", "2024-01-01 13:00:00"))    // watermark -> 13:00: user 1 expired
      q.processAllAvailable()
      input.addData(e(1L, "click", "2024-01-01 13:30:00"))   // funnel restarted: click ignored
      q.processAllAvailable()
      val got = spark.table("fne").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(got == Set((1L, 1), (9L, 1))) // no stage-2 for user 1 after expiry
    } finally q.stop()
  }

  test("exactWithinWatermark: re-crawled duplicates suppressed, distinct docs pass") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[NewsEvent]
    val q = graft.streaming.StreamingDedup
      .exactWithinWatermark(input.toDF(), "headline", "ts", "1 hour")
      .writeStream.format("memory").queryName("sd").outputMode("append").start()
    try {
      input.addData(
        ev("A", "2024-01-01 10:00:00", "same story"),
        ev("B", "2024-01-01 10:01:00", "same story"),     // dup within batch
        ev("C", "2024-01-01 10:02:00", "different story"))
      q.processAllAvailable()
      input.addData(ev("D", "2024-01-01 10:30:00", "same story")) // dup across batches
      q.processAllAvailable()
      val got = spark.table("sd").collect().map(_.getString(2)).toSeq.sorted
      assert(got == Seq("different story", "same story")) // each text exactly once
    } finally q.stop()
  }

  test("funnel state survives a query restart from its checkpoint") {
    // the production claim behind mapGroupsWithState: a deploy/crash
    // restart resumes from the state store, it does not re-arm funnels.
    // Phase 1 reaches stage 1, the query STOPS; phase 2 restarts the
    // same plan from the same checkpoint and must advance to stage 2 —
    // possible only if FunnelState(view@10:00) was recovered, since the
    // view event is never replayed into phase 2's sink.
    import graft.streaming.StreamingFunnel
    import graft.streaming.StreamingFunnel.Ev
    implicit val ctx = spark.sqlContext
    // memory sink rejects recovery; the parquet sink is the
    // fault-tolerant one, so the restart goes through a temp file sink
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_fnr_out").toString
    val input = MemoryStream[Ev]
    def e(u: Long, t: String, ts: String) = Ev(u, t, java.sql.Timestamp.valueOf(ts))
    def startQuery() =
      StreamingFunnel.stageAdvances(input.toDS(), Seq("view", "click"))
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).outputMode("append").start()
    def advances(): Set[(Long, Int)] =
      spark.read.parquet(outDir).collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet

    val q1 = startQuery()
    try {
      input.addData(e(1L, "view", "2024-01-01 10:00:00"))
      q1.processAllAvailable()
      assert(advances() == Set((1L, 1)))
    } finally q1.stop()

    val q2 = startQuery()
    try {
      input.addData(e(1L, "click", "2024-01-01 10:05:00"))
      q2.processAllAvailable()
      assert(advances().contains((1L, 2)),
        s"state not recovered across restart: ${advances()}") // stage 2 only reachable via recovered stage-1 state
    } finally q2.stop()
  }

  test("firstSeenScan: batch twin picks the stream's surviving first-seen rows") {
    // same log as the exactWithinWatermark test above, replayed as a
    // bounded table: the (min (ts, key)) row per text survives
    val batch = Seq(
      ev("A", "2024-01-01 10:00:00", "same story"),
      ev("B", "2024-01-01 10:01:00", "same story"),
      ev("C", "2024-01-01 10:02:00", "different story"),
      ev("D", "2024-01-01 10:30:00", "same story")).toDF()
    val got = graft.streaming.StreamingDedup
      .firstSeenScan(batch, "key", "headline", "ts")
      .collect().map(r => (r.getString(1), r.getLong(3))).toSet
    assert(got == Set(("A", 3L), ("C", 1L))) // first-seen key, dup count
  }

  test("nearDupPairsScan: batch twin equals the distinct streaming pair stream") {
    val dupText = "the quick brown fox jumps over the lazy dog"
    val docs = Seq(
      DocEvent(1, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), dupText),
      DocEvent(4, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
        "completely different words about spark query engines here"),
      DocEvent(2, java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), dupText)).toDF()
    val got = graft.streaming.StreamingNearDedup
      .nearDupPairsScan(docs, "doc_id", "text",
        numBands = 4, rowsPerBand = 3, minEstJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the streaming test above emits exactly {(1,2,1.0)} (per colliding
    // band, deduped); the scan is its distinct equivalent
    assert(got == Set((1L, 2L, 1.0)))
  }

  test("near-dup hot-bucket guard: scan drops saturated buckets; stream stops enrolling") {
    val boiler = "the same boilerplate footer text repeated on every page"
    val many = (1L to 5L).map(i =>
      DocEvent(i, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), boiler)).toDF()
    // batch scan: bucket of 5 > cap 3 -> dropped before the self-join
    assert(graft.streaming.StreamingNearDedup
      .nearDupPairsScan(many, "doc_id", "text", maxBucket = 3).count() == 0)
    // cap at the bucket size: all C(5,2) pairs band
    assert(graft.streaming.StreamingNearDedup
      .nearDupPairsScan(many, "doc_id", "text", maxBucket = 5).count() == 10)

    // stream: residents cap 2 -> docs 1,2 enroll and pair; 3..5 arrive
    // into a saturated bucket and neither pair nor grow state
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[DocEvent]
    val q = graft.streaming.StreamingNearDedup
      .nearDupPairs(input.toDF(), "doc_id", "text", "ts", maxBucket = 2)
      .writeStream.format("memory").queryName("ndcap").outputMode("append").start()
    try {
      input.addData((1L to 5L).map(i =>
        DocEvent(i, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), boiler)))
      q.processAllAvailable()
      val got = spark.table("ndcap").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == Set((1L, 2L, 1.0)))
    } finally q.stop()

    // at-least-once re-delivery must not eat the bucket budget: doc 1
    // arrives twice (cap 2), then doc 2 — with duplicate enrollment the
    // bucket would read saturated and the real pair would be lost
    val input2 = MemoryStream[DocEvent]
    val q2 = graft.streaming.StreamingNearDedup
      .nearDupPairs(input2.toDF(), "doc_id", "text", "ts", maxBucket = 2)
      .writeStream.format("memory").queryName("ndredeliver")
      .outputMode("append").start()
    try {
      def d1 = DocEvent(1, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), boiler)
      input2.addData(d1); q2.processAllAvailable()
      input2.addData(d1); q2.processAllAvailable()   // re-delivery
      input2.addData(DocEvent(2,
        java.sql.Timestamp.valueOf("2024-01-01 10:01:00"), boiler))
      q2.processAllAvailable()
      val got = spark.table("ndredeliver").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == Set((1L, 2L, 1.0)))
    } finally q2.stop()
  }

  test("funnel state guard: a v1 millisecond checkpoint fails fast; v2 states pass") {
    import graft.streaming.StreamingFunnel
    val v2 = StreamingFunnel.FunnelState(2,
      java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime * 1000)
    assert(StreamingFunnel.checkStateVersion(1L, v2) eq v2)
    // stage 0 carries the init sentinel in both versions — passes
    val init = StreamingFunnel.FunnelState(0, Long.MinValue)
    assert(StreamingFunnel.checkStateVersion(1L, init) eq init)
    // a corrupt-zero upstream timestamp (1970-01-01) is genuine v2
    // state below the ms-era window — must NOT trip the guard
    val epochy = StreamingFunnel.FunnelState(1, 0L)
    assert(StreamingFunnel.checkStateVersion(1L, epochy) eq epochy)
    // a v1 state stored MILLISECONDS in the same slot — must throw
    val v1 = StreamingFunnel.FunnelState(2,
      java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime)
    val e = intercept[IllegalStateException] {
      StreamingFunnel.checkStateVersion(7L, v1)
    }
    assert(e.getMessage.contains("discard the checkpoint"))
  }

  test("stageAdvancesScan: batch twin replays the funnel stream's advances") {
    import graft.streaming.StreamingFunnel
    import graft.streaming.StreamingFunnel.IdEv
    // the stageAdvances test's event log with arrival-order event ids
    def e(id: Long, u: Long, t: String, ts: String) =
      IdEv(u, id, t, java.sql.Timestamp.valueOf(ts))
    val evs = Seq(
      e(0, 1L, "click", "2024-01-01 09:00:00"),
      e(1, 1L, "view", "2024-01-01 10:00:00"),
      e(2, 1L, "click", "2024-01-01 10:05:00"),
      e(3, 2L, "view", "2024-01-01 10:00:00"),
      e(4, 1L, "click", "2024-01-01 10:06:00"),
      e(5, 1L, "purchase", "2024-01-01 10:04:00"),
      e(6, 1L, "purchase", "2024-01-01 10:10:00"),
      e(7, 2L, "purchase", "2024-01-01 11:00:00")).toDS()
    val got = StreamingFunnel
      .stageAdvancesScan(evs, Seq("view", "click", "purchase"))
      .collect().map(a => (a.user_id, a.stage, a.event_type)).toSet
    assert(got == Set((1L, 1, "view"), (1L, 2, "click"), (1L, 3, "purchase"),
      (2L, 1, "view")))
  }

  test("session_window finalizes sessions in streaming append mode once the watermark passes") {
    import org.apache.spark.sql.functions._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[NewsEvent]
    val q = input.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(col("key"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("key"), col("session_window.start").as("s"),
        col("session_window.end").as("e"), col("n"))
      .writeStream.format("memory").queryName("sw").outputMode("append").start()
    try {
      input.addData(
        ev("A", "2024-01-01 10:00:00", "x"),
        ev("A", "2024-01-01 10:10:00", "x"),   // merges: gap 10 min < 30
        ev("A", "2024-01-01 10:20:00", "x"),   // extends session to 10:50
        ev("B", "2024-01-01 10:05:00", "x"))
      q.processAllAvailable()
      assert(spark.table("sw").count() == 0)   // watermark 10:10 < session ends

      input.addData(ev("A", "2024-01-01 12:00:00", "advances-watermark"))
      q.processAllAvailable()
      input.addData(ev("A", "2024-01-01 12:01:00", "tick"))
      q.processAllAvailable()
      val got = spark.table("sw").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).toString.substring(11, 16),
          r.getTimestamp(2).toString.substring(11, 16), r.getLong(3))).toSet
      assert(got == Set(
        ("A", "10:00", "10:50", 3L),           // 3 events merged, end = last + gap
        ("B", "10:05", "10:35", 1L)))
    } finally q.stop()
  }

  test("streaming near-dup: band-bucket state pairs new docs against residents, then expires") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[DocEvent]
    def doc(id: Long, t: String, text: String) =
      DocEvent(id, java.sql.Timestamp.valueOf(t), text)
    val dupText = "the quick brown fox jumps over the lazy dog"
    val q = graft.streaming.StreamingNearDedup
      .nearDupPairs(input.toDF(), "doc_id", "text", "ts",
        numBands = 4, rowsPerBand = 3, minEstJaccard = 0.5,
        watermark = "10 minutes", retention = java.time.Duration.ofMinutes(30))
      .writeStream.format("memory").queryName("nd").outputMode("append").start()
    try {
      input.addData(
        doc(1, "2024-01-01 10:00:00", dupText),
        doc(4, "2024-01-01 10:00:00", "completely different words about spark query engines here"))
      q.processAllAvailable()
      assert(spark.table("nd").count() == 0)   // nothing to pair with yet

      input.addData(doc(2, "2024-01-01 10:05:00", dupText))
      q.processAllAvailable()
      val rows = spark.table("nd").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // exact dup: all signatures agree; emitted once per colliding band
      assert(rows.nonEmpty && rows.length <= 4)
      assert(rows.toSet == Set((1L, 2L, 1.0)))
      assert(!rows.exists(p => p._1 == 4L || p._2 == 4L))

      // advance the watermark past the bucket timeout (10:05 + 30 min),
      // then let the NEXT batch process the expirations
      input.addData(doc(90, "2024-01-01 11:30:00", "unrelated filler text one"))
      q.processAllAvailable()
      input.addData(doc(91, "2024-01-01 11:40:00", "unrelated filler text two"))
      q.processAllAvailable()
      input.addData(doc(5, "2024-01-01 11:45:00", dupText))
      q.processAllAvailable()
      // residents 1 and 2 expired: doc 5 pairs with nothing
      assert(!spark.table("nd").collect().exists(r =>
        r.getLong(0) == 5L || r.getLong(1) == 5L))
    } finally q.stop()
  }

  test("firstSeenWindows: first window arrival clean, later occurrences dup, state across batches") {
    import graft.streaming.StreamingSpans
    import graft.streaming.StreamingSpans.WinIn
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[WinIn]
    def win(doc: Long, p: Long, hash: String, t: String) =
      WinIn(doc, p, hash, java.sql.Timestamp.valueOf(t))
    val q = StreamingSpans.firstSeenWindows(input.toDS())
      .writeStream.format("memory").queryName("fsw").outputMode("append").start()
    try {
      input.addData(
        win(2L, 5L, "hA", "2024-01-01 10:00:05"), // later ts: dup of doc 1's copy
        win(1L, 1L, "hA", "2024-01-01 10:00:01"), // first arrival of hA -> clean
        win(1L, 2L, "hB", "2024-01-01 10:00:01"))
      q.processAllAvailable()
      input.addData(
        win(3L, 1L, "hA", "2024-01-01 10:00:00"), // EARLIER ts, later batch: dup (arrival order)
        win(3L, 7L, "hC", "2024-01-01 10:00:09"))
      q.processAllAvailable()
      val got = spark.table("fsw").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).sorted.toSeq
      assert(got == Seq(("hA", 1L, 1L, false), ("hA", 2L, 5L, true), ("hA", 3L, 1L, true),
        ("hB", 1L, 2L, false), ("hC", 3L, 7L, false)))
    } finally q.stop()
  }

  test("firstSeenSpanScan: arrival-first occurrence excluded from hits, islands merge the rest") {
    import graft.streaming.StreamingSpans
    // w=2: doc 1 (earliest) owns "a b"/"b c"/"c d" clean; doc 11 repeats
    // "a b c d" -> all 3 windows hit, merging into ONE span of 4 tokens;
    // doc 12 repeats only "c d" -> one 1-window span of 2 tokens
    val rows = Seq(
      (1L, "a b c d", "2024-01-01 10:00:01"),
      (11L, "a b c d", "2024-01-01 10:00:02"),
      (12L, "x y c d", "2024-01-01 10:00:03")
    ).map { case (i, t, ts) => (i, t, java.sql.Timestamp.valueOf(ts)) }
      .toDF("doc_id", "text", "ts")
    val got = StreamingSpans
      .firstSeenSpanScan(rows, "doc_id",
        org.apache.spark.sql.functions.col("text"), "ts", w = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 3L, 0L, 0L, 0L, 0L),
      (11L, 3L, 3L, 1L, 4L, 4L),
      (12L, 3L, 1L, 1L, 2L, 2L)))
  }

  test("admitToTargets: per-source running counts enforce frozen targets across batches") {
    import graft.streaming.StreamingMix
    import graft.streaming.StreamingMix.{Doc => MixDoc}
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[MixDoc]
    def d(src: String, id: Long, t: String) =
      MixDoc(src, id, java.sql.Timestamp.valueOf(t))
    val q = StreamingMix.admitToTargets(input.toDS(),
        Map("head" -> 2L, "tail" -> 1L)) // "new" absent: admits nothing
      .writeStream.format("memory").queryName("mix").outputMode("append").start()
    try {
      input.addData(
        d("head", 10L, "2024-01-01 10:00:02"),
        d("head", 11L, "2024-01-01 10:00:01"), // earlier ts: rank 1
        d("tail", 20L, "2024-01-01 10:00:01"),
        d("new", 30L, "2024-01-01 10:00:01"))
      q.processAllAvailable()
      input.addData(
        d("head", 12L, "2024-01-01 10:00:03"), // head at target: suppressed
        d("tail", 21L, "2024-01-01 10:00:04")) // tail at target: suppressed
      q.processAllAvailable()
      val got = spark.table("mix").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(3))).sorted.toSeq
      assert(got == Seq(("head", 10L, 2), ("head", 11L, 1), ("tail", 20L, 1)))
    } finally q.stop()
  }

  test("mixAdmitScan: self-calibrated √-temperature targets cut each source to its arrival prefix") {
    import graft.streaming.StreamingMix
    import org.apache.spark.sql.functions._
    // head 8 docs, tail 2 docs; budget 5: w_head = √8·1e6, w_tail = √2·1e6,
    // targets = floor(5·w/Σw) = (3, 1)
    val rows = (1L to 8L).map(i => ("head", i)) ++ Seq(("tail", 101L), ("tail", 102L))
    val df = rows.toDF("source", "doc_id")
      .withColumn("ts", timestamp_seconds(lit(1704067200L) + col("doc_id")))
    val got = StreamingMix.mixAdmitScan(df, "source", "doc_id", "ts", budget = 5L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(x => (x._1, x._4)).toSeq
    assert(got == Seq(
      ("head", 3L, 1L, 1), ("head", 3L, 2L, 2), ("head", 3L, 3L, 3),
      ("tail", 1L, 101L, 1)))
  }

  test("binary screen: stateless stream-static candidate emission in append mode; live ≡ batch twin") {
    import graft.streaming.StreamingBinaryScreen
    import graft.operators.Similarity
    implicit val ctx = spark.sqlContext
    val bands = 8
    val rnd = new scala.util.Random(5)
    val baseRows = (0L until 20L).map(i =>
      (i, Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat)))
    val base = baseRows.toDF("id", "vec")
    // the index job's artifacts: band postings with the code halves
    // denormalized onto every row (the fmt-2 layout), built once
    val codes = Similarity.binaryCodes(base, "id", "vec")
      .localCheckpoint(true)
    val postings = Similarity
      .binaryBands(codes, bands, carry = Seq("code_lo", "code_hi"))
      .localCheckpoint(true)
    def twin(src: Long, newId: Long): (Long, Array[Float]) = {
      val v = baseRows(src.toInt)._2.clone(); v(0) = -v(0); (newId, v)
    }
    def novel(src: Long, newId: Long): (Long, Array[Float]) =
      (newId, baseRows(src.toInt)._2.map(x => -x))
    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamingBinaryScreen.screen(input.toDS().toDF("id", "vec"),
        postings, bands, maxHamming = bands - 1)
      .writeStream.format("memory").queryName("binscr")
      .outputMode("append").start()
    try {
      input.addData(twin(7L, 1001L), novel(2L, 1002L))
      q.processAllAvailable()
      // batch 2 needs NO carried state: a repeat of the novel vector
      // still emits nothing, another near twin still surfaces
      input.addData(twin(3L, 1003L), novel(2L, 1004L))
      q.processAllAvailable()
      val out = spark.table("binscr").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSeq
      // a first-dim sign flip is Hamming 1: inside the pigeonhole
      // radius, so the twin MUST collide with its source in every band
      // not containing the flipped bit (≥ bands−1 cells)
      for ((nid, src) <- Seq(1001L -> 7L, 1003L -> 3L)) {
        val hits = out.filter(p => p._1 == nid && p._2 == src)
        assert(hits.size >= bands - 1, s"twin $nid missing collisions")
        assert(hits.forall(_._4 <= 1))
      }
      // fully negated arrivals are ~Hamming 64 from everything: the
      // radius cut drops every chance cell collision
      assert(!out.exists(p => p._1 == 1002L || p._1 == 1004L))
      // and the live rows equal the batch twin's over the same arrivals
      val arrivals = Seq(twin(7L, 1001L), novel(2L, 1002L),
        twin(3L, 1003L), novel(2L, 1004L)).toDF("id", "vec")
      val batch = StreamingBinaryScreen.screenScan(base, arrivals, bands,
        bands - 1)
      val batchForm = batch
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSeq
      assert(out.sorted == batchForm.sorted)
      // the denormalized postings buy the screen its whole point: ONE
      // join per micro-batch — a second (corpus-sized codes back onto
      // postings) join would re-appear as another join node here
      // AQE's toString appends an "== Initial Plan ==" copy — count
      // join nodes in the final plan section only
      val p = batch.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)".r
        .findAllIn(p).toSeq
      assert(joins.size == 1,
        s"binary screen should be a single stream-static join, got " +
          s"${joins.mkString(", ")}:\n$p")
    } finally q.stop()
  }
}

/** Top-level so the MemoryStream encoder needs no outer instance. */
case class DocEvent(doc_id: Long, ts: java.sql.Timestamp, text: String)
