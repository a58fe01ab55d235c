package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.streaming.StreamingOps

/** Event-time operators (tumbling windows, gap sessionization) run in
  * BATCH mode for the correctness gate — the same code drives the
  * Structured Streaming path (see [[graft.streaming.StreamingOps]] and
  * its spec). Times are compared as exact epoch microseconds so the
  * ns-parquet → µs truncation is identical on both sides.
  */
object StreamQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q19_hourly_window" -> ((s, dir) =>
      Tables.table(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(25, 6))).cast(DoubleType)
            .as("total"))
        .select(unix_micros(col("window.start")).as("hour_us"),
          col("event_type"), col("n"), col("total"))
        .orderBy(col("hour_us"), col("event_type"))),

    // as-of join (attribution): each purchase -> the user's most recent
    // view at-or-before it; composed union+window op, one shuffle
    "q21_asof" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"), col("ts"),
          unix_micros(col("ts")).as("last_view_us"))
      graft.operators.AsOfJoin.asof(
          purchases, "user_id", "ts", views, "user_id", "ts",
          Map("view_id" -> "last_view_id", "last_view_us" -> "last_view_us"),
          rightTie = "view_id")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("last_view_id"), col("last_view_us"))
        .orderBy(col("purchase_id"))
    }),

    "q20_sessionize" -> ((s, dir) => {
      import s.implicits._
      val events = Tables.table(s, dir, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[StreamingOps.Event]
      StreamingOps.sessionizeBatch(events, gapMinutes = 30)
        .toDF()
        .orderBy(col("user_id"), col("session_start_us"))
    }),

    // hot-key-safe as-of join: same semantics as q21 (and the same
    // DuckDB oracle), but windows are partitioned by (key, time-bucket)
    // with carry-in state, so no task ever holds a whole key
    "q32_asof_bucketed" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"), col("ts"),
          unix_micros(col("ts")).as("last_view_us"))
      graft.operators.AsOfJoin.asofBucketed(
          purchases, "user_id", "ts", views, "user_id", "ts",
          Map("view_id" -> "last_view_id", "last_view_us" -> "last_view_us"),
          rightTie = "view_id", bucketMicros = 6L * 3600 * 1000000)
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("last_view_id"), col("last_view_us"))
        .orderBy(col("purchase_id"))
    }),

    // stream-stream join surface, driven through its batch mode (the
    // exact same function body runs under readStream — StreamingSpec
    // asserts streaming == batch on planted data)
    "q29_streamjoin" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
      StreamingOps.viewClickJoin(
          ev.filter(col("event_type") === "view"),
          ev.filter(col("event_type") === "click"),
          windowMin = 30)
        .orderBy(col("user_id"), col("view_id"), col("click_id"))
    }),

    // stream-stream LEFT OUTER join, batch twin: views with no click in
    // their window survive with NULL click columns — the abandoned-
    // funnel query. The streaming form's distinct semantics (unmatched
    // rows emit only after the watermark clears the window) are pinned
    // in StreamingSpec; this gate pins the join/null values.
    "q45_streamjoin_outer" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
      StreamingOps.viewClickJoin(
          ev.filter(col("event_type") === "view"),
          ev.filter(col("event_type") === "click"),
          windowMin = 30, joinType = "left_outer")
        .orderBy(col("user_id"), col("view_id"), col("click_id"))
    }),

    // BUILT-IN session_window aggregation (q58): the declarative twin
    // of q20's stateful sessionization — `groupBy(session_window(ts,
    // gap), user)` merges events whose time is strictly inside the
    // previous session's [start, last + gap) range; an event landing
    // EXACTLY at last + gap opens a new session (end-exclusive, per
    // the engine's session-merge rule — the oracle's break condition
    // mirrors that with >=). Same state-store shape under readStream;
    // in batch it plans as a window-free aggregate.
    "q58_session_window" -> ((s, dir) =>
      Tables.table(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(25, 6))).cast(DoubleType)
            .as("total"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("session_start_us"),
          unix_micros(col("session_window.end")).as("session_end_us"),
          col("n_events"), col("total"))
        .orderBy(col("user_id"), col("session_start_us"))),

    // ordered FUNNEL analysis: per user, the earliest view, the
    // earliest click STRICTLY AFTER that view, and the earliest
    // purchase strictly after that click — the product-analytics
    // staple where event ORDER matters, not mere presence (a purchase
    // before the first view must not count). Three successive
    // per-user min-aggregates, each joined back to the (type-filtered)
    // event stream on user_id: every shuffle carries per-user
    // aggregate rows, and each stage's event scan is pruned to its one
    // event type. Left joins preserve users who fall out mid-funnel;
    // stage = how far they got.
    "q56_funnel" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("us")).as("view_us"))
      val c = ev.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("us") > col("view_us"))
        .groupBy("user_id").agg(min(col("us")).as("click_us"))
      val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
        .filter(col("us") > col("click_us"))
        .groupBy("user_id").agg(min(col("us")).as("purchase_us"))
      v.join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .withColumn("stage",
          when(col("purchase_us").isNotNull, 3)
            .when(col("click_us").isNotNull, 2).otherwise(1))
        .orderBy(col("user_id"))
    }))

  /** As-of oracle shared by q21 (single-window asof) and q32 (bucketed
    * hot-key-safe asof — same semantics by construction). */
  private val asofOracle: String =
    """WITH p AS (
        | SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS pus
        | FROM events WHERE event_type = 'purchase'),
        |v AS (
        | SELECT event_id AS view_id, user_id, epoch_us(ts) AS vus
        | FROM events WHERE event_type = 'view'),
        |j AS (
        | SELECT p.purchase_id, p.user_id, v.view_id, v.vus,
        |  row_number() OVER (PARTITION BY p.purchase_id
        |                     ORDER BY v.vus DESC, v.view_id DESC) AS rn
        | FROM p LEFT JOIN v ON v.user_id = p.user_id AND v.vus <= p.pus)
        |SELECT purchase_id, user_id, view_id AS last_view_id,
        | vus AS last_view_us
        |FROM j WHERE rn = 1 ORDER BY purchase_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "q19_hourly_window" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
        | count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY hour_us, event_type""".stripMargin,

    "q21_asof" -> asofOracle,

    // identical semantics to q21, different (hot-key-safe) plan — shared val
    "q32_asof_bucketed" -> asofOracle,

    "q20_sessionize" ->
      """WITH e AS (
        | SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
        |f AS (
        | SELECT user_id, us, event_id,
        |  CASE WHEN us - lag(us) OVER (PARTITION BY user_id
        |                               ORDER BY us, event_id) <= 1800000000
        |       THEN 0 ELSE 1 END AS brk
        | FROM e),
        |g AS (
        | SELECT user_id, us,
        |  sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                 ROWS UNBOUNDED PRECEDING) AS sid
        | FROM f)
        |SELECT user_id, min(us) AS session_start_us,
        | CAST(count(*) AS INT) AS n_events
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin,

    "q29_streamjoin" ->
      """SELECT v.user_id AS user_id,
        | v.event_id AS view_id, c.event_id AS click_id,
        | epoch_us(v.ts) AS view_us, epoch_us(c.ts) AS click_us
        |FROM events v JOIN events c
        | ON v.user_id = c.user_id
        | AND v.event_type = 'view' AND c.event_type = 'click'
        | AND c.ts >= v.ts
        | AND c.ts <= v.ts + INTERVAL 30 MINUTE
        |ORDER BY user_id, view_id, click_id""".stripMargin,

    "q45_streamjoin_outer" ->
      """WITH v AS (SELECT * FROM events WHERE event_type = 'view'),
        |c AS (SELECT * FROM events WHERE event_type = 'click')
        |SELECT v.user_id AS user_id,
        | v.event_id AS view_id, c.event_id AS click_id,
        | epoch_us(v.ts) AS view_us, epoch_us(c.ts) AS click_us
        |FROM v LEFT JOIN c
        | ON v.user_id = c.user_id
        | AND c.ts >= v.ts
        | AND c.ts <= v.ts + INTERVAL 30 MINUTE
        |ORDER BY user_id, view_id, click_id""".stripMargin,

    "q58_session_window" ->
      """WITH e AS (
        | SELECT user_id, epoch_us(ts) AS us, value FROM events),
        |f AS (
        | SELECT user_id, us, value,
        |  CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
        |       >= 1800000000 THEN 1 ELSE 0 END AS brk
        | FROM e),
        |g AS (
        | SELECT user_id, us, value,
        |  sum(brk) OVER (PARTITION BY user_id ORDER BY us
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        | FROM f)
        |SELECT user_id, min(us) AS session_start_us,
        | max(us) + 1800000000 AS session_end_us,
        | count(*) AS n_events,
        | CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin,

    "q56_funnel" ->
      """WITH e AS (
        | SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (SELECT user_id, min(us) AS view_us FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(us) AS click_us
        |      FROM e JOIN v ON e.user_id = v.user_id
        |      WHERE event_type = 'click' AND us > view_us
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(us) AS purchase_us
        |      FROM e JOIN c ON e.user_id = c.user_id
        |      WHERE event_type = 'purchase' AND us > click_us
        |      GROUP BY e.user_id)
        |SELECT v.user_id, view_us, click_us, purchase_us,
        | CASE WHEN purchase_us IS NOT NULL THEN 3
        |      WHEN click_us IS NOT NULL THEN 2 ELSE 1 END AS stage
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin)
}
