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

    "q20_sessionize" -> ((s, dir) => {
      import s.implicits._
      val events = Tables.table(s, dir, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[StreamingOps.Event]
      StreamingOps.sessionizeBatch(events, gapMinutes = 30)
        .toDF()
        .orderBy(col("user_id"), col("session_start_us"))
    }))

  val oracle: Map[String, String] = Map(
    "q19_hourly_window" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
        | count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY hour_us, event_type""".stripMargin,

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
        |ORDER BY user_id, session_start_us""".stripMargin)
}
