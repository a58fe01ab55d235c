package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.scalatest.funsuite.AnyFunSuite

/** Shuffle-volume regression pins for the suite's heaviest gates
  * (round-11, VERDICT r10 item 7): a future plan regression that
  * re-shuffles payloads (shingle arrays, pixel rows, full vectors)
  * where today only ids/fingerprints ride the exchange should fail
  * `sbt test` — not wait for a bench read two rounds later.
  *
  * Each pin runs the REGISTERED gate at sf0.01 under the bench action
  * (`toRdd.count`) with a task-metrics listener summing shuffle WRITE
  * records and bytes across every job the gate runs (iterative gates
  * like m13's connected components run several), then asserts an upper
  * bound set at ~1.5x the round-11 measured volume. Shuffle-exchange
  * count in the final plan rides along as a secondary structure pin.
  */
class ShuffleVolumeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  /** (shuffle records written, shuffle bytes written, #shuffle
    * exchanges in the final plan) for one full gate execution. */
  private def measure(name: String): (Long, Long, Int) = {
    val sc = spark.sparkContext
    val recs = new AtomicLong
    val bytes = new AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          recs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    }
    SparkEntry.resetSessionConfs(spark)
    sc.addSparkListener(listener)
    try {
      val df = SparkEntry.queries(name)(spark, dir)
      df.queryExecution.toRdd.count()
      // fire Observation completion (toRdd.count bypasses withAction)
      org.apache.spark.sql.graftbridge.Bridge.fireObservations(df, "pin", 0L)
      // the listener bus drains asynchronously: settle until three
      // consecutive 100ms reads agree
      var last = -1L
      var same = 0
      while (same < 3) {
        Thread.sleep(100)
        val cur = recs.get + bytes.get
        if (cur == last) same += 1 else { same = 0; last = cur }
      }
      val plan = df.queryExecution.executedPlan.toString
      val nEx = "Exchange (hash|range|Single)".r.findAllIn(plan).size
      info(f"$name: ${recs.get}%,d shuffle records, " +
        f"${bytes.get}%,d bytes, $nEx shuffle exchanges")
      (recs.get, bytes.get, nEx)
    } finally sc.removeSparkListener(listener)
  }

  private def pin(name: String, maxRecords: Long, maxBytes: Long,
      maxExchanges: Int): Unit = {
    val (r, b, e) = measure(name)
    assert(r <= maxRecords,
      s"$name shuffle RECORDS regressed: $r > pinned $maxRecords")
    assert(b <= maxBytes,
      s"$name shuffle BYTES regressed: $b > pinned $maxBytes")
    assert(e <= maxExchanges,
      s"$name final-plan shuffle-exchange count regressed: $e > $maxExchanges")
  }

  // Bounds = round-11 measured volume x ~1.5 (records/exchanges) and
  // x ~2 (bytes — codec/layout changes legitimately move bytes more
  // than rows). Measured at sf0.01 on 2026-08-15:
  //   p69: 25,765 recs / 756,281 B / 10 exchanges
  //   p72:  3,243 recs /  51,904 B /  8 exchanges
  //   p79: 27,182 recs / 785,690 B / 14 exchanges
  //   m13:  6,001 recs / 101,732 B /  7 exchanges
  test("p69_setsim_join shuffle volume stays pinned") {
    pin("p69_setsim_join", maxRecords = 40000L, maxBytes = 1600000L,
      maxExchanges = 12)
  }

  test("p72_kmeans_semdedup shuffle volume stays pinned") {
    pin("p72_kmeans_semdedup", maxRecords = 5000L, maxBytes = 110000L,
      maxExchanges = 10)
  }

  test("p79_threshold_sweep shuffle volume stays pinned") {
    pin("p79_threshold_sweep", maxRecords = 42000L, maxBytes = 1600000L,
      maxExchanges = 16)
  }

  test("m13_image_dedup_cluster shuffle volume stays pinned") {
    pin("m13_image_dedup_cluster", maxRecords = 9000L, maxBytes = 220000L,
      maxExchanges = 9)
  }

  // p83: 17,924 recs / 610,937 B / 8 exchanges (measured 2026-08-15)
  test("p83_containment_join shuffle volume stays pinned") {
    ObsRegistry.drain() // earlier gates' leftovers must not alias ours
    pin("p83_containment_join", maxRecords = 27000L, maxBytes = 1250000L,
      maxExchanges = 10)
    // candidate-volume pin (round-12, VERDICT r11 item 4): the gate
    // registers a containmentJoin Observation; the counts bound the
    // container-side fan-out (Σ df over contained prefixes) at ~1.5x
    // the measured sf0.01 values — hot-shingle growth now fails here,
    // not in a bench read. Measured 2026-08-15: 780 after the length
    // filter, 184 after dedup (90 true pairs survive verification).
    val obs = ObsRegistry.drain().collect {
      case ("p83_containment_join", m) => m
    }
    assert(obs.nonEmpty, "p83 gate no longer registers its Observation")
    val m = obs.head
    val afterLen = m("cands_after_length").toString.toLong
    val afterDedup = m("cands_after_dedup").toString.toLong
    info(s"p83 candidates: $afterLen after length filter, " +
      s"$afterDedup after dedup")
    assert(afterLen > 0 && afterDedup > 0 && afterDedup <= afterLen)
    assert(afterLen <= 1200L,
      s"p83 pre-dedup candidate volume regressed: $afterLen > 1200")
    assert(afterDedup <= 280L,
      s"p83 post-dedup candidate count regressed: $afterDedup > 280")
  }

  // p85: 4,596 recs / 50,359 B / 4 exchanges; 9,012 candidate pairs
  // after the length filter, 228 past the m>=8 screen (measured
  // 2026-08-15 at sf0.01). Note the shape vs p83: the screen explores
  // MORE distinct pairs (uniform-random argmin winners hit common
  // shingles more often than rare-first prefixes) but ships ~4x fewer
  // shuffle records and ~12x fewer bytes — k probe rows per doc and a
  // broadcast-joined probe side; false positives die at verification.
  test("p85_containment_screen shuffle volume stays pinned") {
    ObsRegistry.drain()
    pin("p85_containment_screen", maxRecords = 7000L, maxBytes = 110000L,
      maxExchanges = 6)
    val obs = ObsRegistry.drain().collect {
      case ("p85_containment_screen", m) => m
    }
    assert(obs.nonEmpty, "p85 gate no longer registers its Observation")
    val m = obs.head
    val afterLen = m("cands_after_length").toString.toLong
    val afterScreen = m("cands_after_screen").toString.toLong
    info(s"p85 candidates: $afterLen pairs after length filter, " +
      s"$afterScreen past the m>=8 screen")
    assert(afterScreen > 0 && afterScreen <= afterLen)
    assert(afterLen <= 13500L,
      s"p85 candidate-pair volume regressed: $afterLen > 13500")
    assert(afterScreen <= 350L,
      s"p85 screened pair count regressed: $afterScreen > 350")
  }

  // p87: 937 recs / 11,618 B / 4 exchanges (measured 2026-08-15) —
  // the Δ-proportional variant ships ~1/5 of p85's already-light
  // volume (probe side = new batch only)
  test("p87_containment_incremental shuffle volume stays pinned") {
    pin("p87_containment_incremental", maxRecords = 1500L,
      maxBytes = 25000L, maxExchanges = 6)
  }

  // Round-13 shuffle-byte diet (VERDICT r12 item 2): at sf0.01 the
  // gate's probe side BROADCASTS, so the gate pins above can't see the
  // key representation at all. This pin forces the at-scale shape
  // (broadcast off → shuffle join, both sides exchange) on the screen's
  // probe⋈index stage and bounds its bytes at the 62-bit-key level:
  // measured 2026-08-15 via TuneScreen bytes-mode, 42,291 records both
  // ways, 518,490 B keyed vs 751,649 B with raw shingle strings
  // (1.45x; 1.26x at sf0.1 — synthetic shingles are short and compress
  // well; real-text shingles widen the gap). A regression back to
  // string keys fails the byte bound.
  test("containment screen probe⋈index exchanges 62-bit keys, " +
      "not shingle strings (no-broadcast byte pin)") {
    SparkEntry.resetSessionConfs(spark)
    val prevA = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevB = scala.util.Try(
      spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold"))
      .toOption.filter(_ != null)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      import org.apache.spark.sql.functions._
      val recs = new AtomicLong
      val bytes = new AtomicLong
      val listener = new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            recs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
            bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          }
        }
      }
      val d = Tables.table(spark, dir, "documents")
      val obs = org.apache.spark.sql.Observation()
      val out = graft.operators.DedupOps.containmentScreen(
        d, "doc_id", "text", tau = 0.9, candObs = Some(obs))
      spark.sparkContext.addSparkListener(listener)
      try {
        out.queryExecution.toRdd.count()
        var last = -1L
        var same = 0
        while (same < 3) {
          Thread.sleep(100)
          val cur = recs.get + bytes.get
          if (cur == last) same += 1 else { same = 0; last = cur }
        }
      } finally spark.sparkContext.removeSparkListener(listener)
      info(f"no-broadcast screen: ${recs.get}%,d records, " +
        f"${bytes.get}%,d bytes")
      // STRUCTURAL pin (volume is too compression-dependent to
      // discriminate: whole-op measured 1,267,942 B keyed vs
      // 1,418,441 B string-keyed at sf0.01): no exchange in the final
      // plan may hash-partition on a StringType expression — the
      // string-keyed probe⋈index partitions on the raw shingle, the
      // 62-bit version and every other stage key on longs
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def walk(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => p +: walk(a.executedPlan)
        case s: QueryStageExec => p +: walk(s.plan)
        case _ => p +: p.children.flatMap(walk)
      }
      val stringKeyed = walk(out.queryExecution.executedPlan).collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if (e.outputPartitioning match {
              case h: org.apache.spark.sql.catalyst.plans.physical
                    .HashPartitioning =>
                h.expressions.exists(_.dataType ==
                  org.apache.spark.sql.types.StringType)
              case _ => false
            }) => e
      }
      assert(stringKeyed.isEmpty,
        s"screen exchange partitions on a STRING key — did the " +
          s"probe⋈index key revert to shingle strings?\n" +
          stringKeyed.map(_.outputPartitioning).mkString("\n"))
      // coarse whole-op volume backstop (2x keyed measurement)
      assert(bytes.get <= 2600000L,
        s"screen no-broadcast shuffle bytes regressed: ${bytes.get}")
      graft.operators.CacheRegistry.releaseAll()
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevA)
      prevB match {
        case Some(v) =>
          spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None =>
          spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }
}
