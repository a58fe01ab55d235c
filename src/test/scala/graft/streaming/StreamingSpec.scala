package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.streaming.StreamingOps.{Event, Session}

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private val batch1 = Seq(
    Event(1, ts(0), 1, "view", 1.0), Event(2, ts(10), 1, "view", 2.0),
    Event(3, ts(20), 1, "buy", 3.0),
    // 40-min gap for user 1 -> second session
    Event(4, ts(60), 1, "view", 4.0),
    Event(5, ts(5), 2, "view", 5.0), Event(6, ts(90), 2, "view", 6.0))

  test("streaming windowed aggregation finalizes windows at the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val agg = StreamingOps.windowedEventCounts(
      mem.toDF(), windowLen = "1 hour", watermark = "30 minutes")
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      // advance the watermark far past every window, then trigger again
      mem.addData(Event(99, ts(600), 9, "late", 0.0))
      q.processAllAvailable()
      mem.addData(Event(100, ts(1200), 9, "late", 0.0))
      q.processAllAvailable()
      val got = spark.table("win_out")
        .filter(col("event_type") =!= "late") // watermark-advance sentinels
        .select(unix_micros(col("win_start")).as("w"), col("event_type"),
          col("n"), col("total"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      val batchEquiv = StreamingOps.windowedEventCounts(
          batch1.toDF(), windowLen = "1 hour", watermark = "30 minutes")
        .select(unix_micros(col("win_start")).as("w"), col("event_type"),
          col("n"), col("total"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(got.nonEmpty, "no windows emitted")
      // every finalized streaming window must equal its batch value
      assert(got.subsetOf(batchEquiv),
        s"streaming rows not in batch result: ${got.diff(batchEquiv)}")
      assert(batchEquiv.subsetOf(got),
        s"batch windows never emitted: ${batchEquiv.diff(got)}")
    } finally q.stop()
  }

  test("streaming sessionization (flatMapGroupsWithState) matches batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val sessions = StreamingOps.sessionizeStream(mem.toDS(), gapMinutes = 30)
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      // push the watermark far enough that every open session times out
      mem.addData(Event(99, ts(2000), 9, "late", 0.0))
      q.processAllAvailable()
      mem.addData(Event(100, ts(4000), 9, "late", 0.0))
      q.processAllAvailable()
      val got = spark.table("sess_out").as[Session].collect()
        .filter(_.user_id != 9).toSet
      val expected = StreamingOps.sessionizeBatch(batch1.toDS(), 30)
        .collect().toSet
      assert(got == expected, s"got $got expected $expected")
    } finally q.stop()
  }

  test("stream-stream view-click join matches the batch join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = Seq(
      Event(1, ts(0), 1, "view", 0), Event(2, ts(50), 1, "view", 0),
      Event(3, ts(10), 2, "view", 0))
    val clicks = Seq(
      Event(11, ts(5), 1, "click", 0),   // within 30m of view 1
      Event(12, ts(55), 1, "click", 0),  // within 30m of view 2 (not 1)
      Event(13, ts(100), 2, "click", 0), // beyond every view window
      Event(14, ts(20), 3, "click", 0))  // user with no views
    val vMem = MemoryStream[Event]
    val cMem = MemoryStream[Event]
    val joined = StreamingOps.viewClickJoin(vMem.toDF(), cMem.toDF(), 30)
    val q = joined.writeStream.format("memory").queryName("vc_out")
      .outputMode("append").start()
    try {
      vMem.addData(views: _*); cMem.addData(clicks: _*)
      q.processAllAvailable()
      // advance both watermarks so every in-window pair is emitted
      vMem.addData(Event(98, ts(500), 9, "view", 0))
      cMem.addData(Event(99, ts(500), 9, "click", 0))
      q.processAllAvailable()
      val got = spark.table("vc_out").filter(col("user_id") =!= 9)
        .select("user_id", "view_id", "click_id")
        .as[(Long, Long, Long)].collect().toSet
      val expected = StreamingOps.viewClickJoin(
          views.toDF(), clicks.toDF(), 30)
        .select("user_id", "view_id", "click_id")
        .as[(Long, Long, Long)].collect().toSet
      assert(expected == Set((1L, 1L, 11L), (1L, 2L, 12L)))
      assert(got == expected, s"got $got expected $expected")
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join emits unmatched views after the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = Seq(
      Event(1, ts(0), 1, "view", 0),  // click 11 in window → matched
      Event(2, ts(10), 2, "view", 0), // user 2's click is out of window
      Event(3, ts(15), 3, "view", 0)) // user with no clicks at all
    val clicks = Seq(
      Event(11, ts(5), 1, "click", 0),
      Event(13, ts(100), 2, "click", 0))
    val vMem = MemoryStream[Event]
    val cMem = MemoryStream[Event]
    val joined = StreamingOps.viewClickJoin(vMem.toDF(), cMem.toDF(), 30,
      joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("vc_outer")
      .outputMode("append").start()
    try {
      vMem.addData(views: _*); cMem.addData(clicks: _*)
      q.processAllAvailable()
      // BEFORE the watermark clears the windows, unmatched views must
      // NOT have been declared unmatched (a late click could still
      // arrive): no NULL-click rows yet
      val early = spark.table("vc_outer")
        .filter(col("click_id").isNull).count()
      assert(early == 0, s"$early views declared unmatched pre-watermark")
      // advance both watermarks far past every window
      vMem.addData(Event(98, ts(500), 9, "view", 0))
      cMem.addData(Event(99, ts(500), 9, "click", 0))
      q.processAllAvailable()
      val got = spark.table("vc_outer").filter(col("user_id") =!= 9)
        .select("user_id", "view_id", "click_id")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      // matched row streams through; views 2 and 3 emit exactly once
      // with NULL click — and the streaming result equals the batch
      // left join through the same code path
      assert(got == Set((1L, 1L, 11L), (2L, 2L, -1L), (3L, 3L, -1L)),
        s"got $got")
    } finally q.stop()
  }

  test("watermarked streaming dedup drops in-horizon duplicate event ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val deduped = StreamingOps.dedupStream(mem.toDF(), watermark = "1 hour")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData(Event(1, ts(0), 1, "view", 1.0),
        Event(2, ts(10), 1, "view", 2.0))
      q.processAllAvailable()
      // duplicates of 1 and 2 inside the watermark horizon + one new id
      mem.addData(Event(1, ts(15), 1, "view", 1.0),
        Event(2, ts(12), 1, "view", 2.0), Event(3, ts(20), 1, "buy", 3.0))
      q.processAllAvailable()
      val got = spark.table("dedup_out").select("event_id")
        .as[Long].collect().toSeq
      assert(got.sorted == Seq(1L, 2L, 3L),
        s"expected each id exactly once, got $got")
    } finally q.stop()
  }

  test("file-source streaming reads the ns-timestamp events fixture") {
    val stream = StreamingOps.eventsStream(spark, "/root/testdata/sf0.001")
    val q = StreamingOps.windowedEventCounts(stream)
      .writeStream.format("memory").queryName("file_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // append mode withholds non-finalized windows; the pipeline
      // running at all (schema fix-up included) is the check here
      assert(q.lastProgress != null)
    } finally q.stop()
  }

  test("streaming sink appends micro-batches into a remote table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.sources.DerbyFixture.init
    val url = graft.sources.DerbyFixture.url
    val c = java.sql.DriverManager.getConnection(url)
    try c.createStatement().executeUpdate(
      """CREATE TABLE stream_sink (
        | event_id BIGINT NOT NULL,
        | user_id BIGINT NOT NULL,
        | value DOUBLE NOT NULL)""".stripMargin)
    finally c.close()

    val mem = MemoryStream[Event]
    val ckpt = s"/tmp/graft_stream_ckpt_${System.nanoTime()}"
    val q = StreamingOps.writeToRemote(
      mem.toDF().select(col("event_id"), col("user_id"), col("value")),
      url, "STREAM_SINK", ckpt)
    try {
      mem.addData(batch1.take(3): _*)
      q.processAllAvailable()
      mem.addData(batch1.drop(3): _*)
      q.processAllAvailable()
      val back = spark.read.format("graft-remote")
        .option("url", url).option("dbtable", "STREAM_SINK").load()
        .orderBy(col("EVENT_ID"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(back.toSeq ==
        batch1.map(e => (e.event_id, e.user_id, e.value)).sortBy(_._1))
    } finally q.stop()
  }

  test("streaming admission screen drops docs the corpus already contains") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.DedupOps
    val corpus = Seq(
      (1L, "seen doc one with plenty of words"),
      (2L, "seen doc two with different words")).toDF("doc_id", "text")
    val idxFps = DedupOps.fingerprintIndex(corpus, "doc_id", "text")
    val bloom = DedupOps.buildFingerprintBloom(corpus, "text", 1000)
    val mem = MemoryStream[(Long, String)]
    val admitted = StreamingOps.admitNewDocs(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", idxFps, bloom)
    val q = admitted.writeStream.format("memory").queryName("admit_out")
      .outputMode("append").start()
    try {
      mem.addData((10L, "brand new doc alpha"),
        (11L, "seen doc one with plenty of words"))
      q.processAllAvailable()
      // re-crawl with case/whitespace drift still fingerprints equal
      mem.addData((12L, "SEEN  doc two with different words"),
        (13L, "another new doc beta"))
      q.processAllAvailable()
      val got = spark.table("admit_out").select(col("doc_id"))
        .as[Long].collect().toSet
      assert(got == Set(10L, 13L),
        s"admission screen admitted/dropped wrong docs: $got")
    } finally q.stop()
  }

  test("streaming containment screen: micro-batched stream output == " +
      "the p87 batch operator on the union (batch-twin parity)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.DedupOps
    // corpus index: 30 docs; stream: 3 micro-batches of new docs, each
    // with planted excerpts (first-half prefixes) + genuinely new docs
    val corpus = (0 until 30).map { i =>
      i.toLong -> (1 to 40).map(j => s"c${i}w$j").mkString(" ")
    }.toDF("doc_id", "text")
    val newDocs = (0 until 12).map { i =>
      val t =
        if (i % 2 == 0) (1 to 20).map(j => s"c${i}w$j").mkString(" ")
        else (1 to 30).map(j => s"n${i}x$j").mkString(" ")
      (1000L + i) -> t
    }
    val mem = MemoryStream[(Long, String)]
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Double)]
    val q = StreamingOps.screenStreamAgainstIndex(
      mem.toDF().toDF("doc_id", "text"), corpus,
      "doc_id", "text", tau = 0.9) { (out, _) =>
      out.as[(Long, Long, Double)].collect().foreach(got.add)
    }
    try {
      newDocs.grouped(4).foreach { g =>
        mem.addData(g: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val batchTwin = DedupOps.containmentScreenNewVsIndex(
        newDocs.toDF("doc_id", "text"), corpus, "doc_id", "text",
        tau = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    import scala.jdk.CollectionConverters._
    assert(got.asScala.toSet == batchTwin,
      s"stream=${got.asScala.toSet}\nbatch=$batchTwin")
    // the planted excerpts (even i) must be found, the novel docs not
    val found = got.asScala.map(_._1).toSet
    assert(found == (0 until 12 by 2).map(1000L + _).toSet, s"$found")
    graft.operators.CacheRegistry.releaseAll()
  }

  test("upsert streaming sink: re-delivered records deduplicate by key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.sources.DerbyFixture.init
    val url = graft.sources.DerbyFixture.url
    val c = java.sql.DriverManager.getConnection(url)
    try c.createStatement().executeUpdate(
      """CREATE TABLE stream_ups (
        | event_id BIGINT NOT NULL,
        | user_id BIGINT NOT NULL,
        | value DOUBLE NOT NULL)""".stripMargin)
    finally c.close()

    // the KEYED idempotence alternative to the epoch ledger: at-least-
    // once redelivery (foreachBatch retries, overlapping offset
    // replays) converges on one row per key because every micro-batch
    // lands as a MERGE — no ledger table needed when rows carry a
    // natural key, and late updates to a key win instead of
    // duplicating
    val mem = MemoryStream[Event]
    val q = StreamingOps.writeToRemote(
      mem.toDF().select(col("event_id"), col("user_id"), col("value")),
      url, "STREAM_UPS", s"/tmp/graft_ups_ckpt_${System.nanoTime()}",
      extraOptions = Map("mergekeys" -> "EVENT_ID",
        "stagingwrite" -> "true"))
    try {
      mem.addData(batch1.take(3): _*)
      q.processAllAvailable()
      // epoch 2 re-delivers event 3 with an UPDATED value (the
      // at-least-once overlap shape) plus genuinely new events
      mem.addData(Event(3, ts(20), 1, "buy", 30.0))
      mem.addData(batch1.drop(3): _*)
      q.processAllAvailable()
    } finally q.stop()

    val back = spark.read.format("graft-remote")
      .option("url", url).option("dbtable", "STREAM_UPS").load()
      .orderBy(col("EVENT_ID"))
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(back == Seq(1L -> 1.0, 2L -> 2.0, 3L -> 30.0, 4L -> 4.0,
      5L -> 5.0, 6L -> 6.0), s"upsert sink diverged: $back")
  }

  test("exactly-once sink: replayed epochs insert no duplicate rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.sources.DerbyFixture.init
    val url = graft.sources.DerbyFixture.url
    val c = java.sql.DriverManager.getConnection(url)
    try c.createStatement().executeUpdate(
      """CREATE TABLE stream_xo (
        | event_id BIGINT NOT NULL,
        | user_id BIGINT NOT NULL,
        | value DOUBLE NOT NULL)""".stripMargin)
    finally c.close()

    def readBack() = spark.read.format("graft-remote")
      .option("url", url).option("dbtable", "STREAM_XO").load()
      .orderBy(col("EVENT_ID"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val expected =
      batch1.map(e => (e.event_id, e.user_id, e.value)).sortBy(_._1)

    val mem = MemoryStream[Event]
    val q = StreamingOps.writeToRemote(
      mem.toDF().select(col("event_id"), col("user_id"), col("value")),
      url, "STREAM_XO", s"/tmp/graft_xo_ckpt_${System.nanoTime()}",
      exactlyOnce = true)
    try {
      mem.addData(batch1.take(3): _*); q.processAllAvailable()
      mem.addData(batch1.drop(3): _*); q.processAllAvailable()
    } finally q.stop()
    assert(readBack() == expected)

    // REPLAY: a fresh checkpoint restarts epoch numbering at 0 — the
    // remote ledger already holds epochs 0 and 1, so both replayed
    // batches must be skipped (restart-from-older-checkpoint shape)
    val mem2 = MemoryStream[Event]
    val q2 = StreamingOps.writeToRemote(
      mem2.toDF().select(col("event_id"), col("user_id"), col("value")),
      url, "STREAM_XO", s"/tmp/graft_xo_ckpt_${System.nanoTime()}",
      exactlyOnce = true)
    try {
      mem2.addData(batch1.take(3): _*); q2.processAllAvailable()
      mem2.addData(batch1.drop(3): _*); q2.processAllAvailable()
    } finally q2.stop()
    assert(readBack() == expected, "replayed epochs duplicated rows")

    // a duplicate epoch that races PAST the pre-check dies on the
    // ledger primary key INSIDE the staged commit transaction — its
    // rows roll back with it (rows-landed and epoch-recorded are one
    // atomic fact)
    val dup = intercept[Exception] {
      batch1.take(3).map(e => (e.event_id, e.user_id, e.value))
        .toDF("event_id", "user_id", "value")
        .write.format("graft-remote")
        .option("url", url).option("dbtable", "STREAM_XO")
        .option("stagingwrite", "true")
        .option("ledgertable", "STREAM_XO_EPOCHS")
        .option("ledgerepoch", "0")
        .mode("append").save()
    }
    assert(dup != null)
    assert(readBack() == expected, "failed duplicate epoch leaked rows")

    // and the ledger demands the staged path: exactly-once without the
    // single commit transaction would be a silent at-least-once
    intercept[Exception] {
      batch1.take(1).map(e => (e.event_id, e.user_id, e.value))
        .toDF("event_id", "user_id", "value")
        .write.format("graft-remote")
        .option("url", url).option("dbtable", "STREAM_XO")
        .option("ledgertable", "STREAM_XO_EPOCHS")
        .option("ledgerepoch", "99")
        .mode("append").save()
    }
  }
}
