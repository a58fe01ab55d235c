package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively,
  * composed from built-ins per the preference order (SURVEY §7.3 (a)):
  * tag both inputs, union them, and run one `last(..., ignoreNulls)`
  * window per attached column. ONE shuffle on the join key, linear in
  * |left| + |right| — never the quadratic key-group join a naive
  * inequality join produces, and no custom SparkPlan needed.
  *
  * Semantics: for each left row, attach the right row of the same key
  * with the greatest `rightTime <= leftTime` (ties broken by the
  * greatest `rightTie`); left rows with no prior right row keep NULLs
  * (LEFT OUTER asof).
  */
object AsOfJoin {

  /** @param rightVals right columns to attach, renamed as given
    * @param rightTie  unique right column used as the deterministic
    *                  tie-break for equal times */
  def asof(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      rightVals: Map[String, String], rightTie: String): DataFrame = {

    val attached = rightVals.values.toSeq
    // right rows first at equal timestamps (side 0 < side 1) => the
    // asof bound is INCLUSIVE; among equal times the later-sorted right
    // row wins inside last(), so sort by tie-break ascending
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast("long"))
    val r = right.select(
      (Seq(col(rightKey).as("__k"), col(rightTime).as("__t"),
        lit(0).as("__side"), col(rightTie).cast("long").as("__tie")) ++
        rightVals.map { case (src, dst) => col(src).as(dst) }.toSeq): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withVals = attached.foldLeft(unioned) { (df, v) =>
      df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
    withVals.filter(col("__side") === 1)
      .drop("__k", "__t", "__side", "__tie")
  }

  /** Hot-key-safe as-of join: identical semantics to [[asof]], but no
    * single window task ever sees a whole key — the round-1 design
    * review's "power user serializes into one window task at 100x"
    * watch item, resolved.
    *
    * Time is cut into fixed `bucketMicros` buckets and the work splits
    * into three bounded stages:
    *   1. per (key, bucket): the last right row of each bucket
    *      (`max_by` aggregate — map-side combinable);
    *   2. per key over BUCKETS (rows = #buckets, not #events): a
    *      running window computes each left-occupied bucket's carry-in —
    *      the right state just before the bucket starts;
    *   3. per (key, bucket): the original union+`last` window, with the
    *      carry-in injected as a synthetic right row that sorts first —
    *      partitioned by (key, bucket), so the hot key's events spread
    *      over #buckets tasks.
    * Worst-case window partition = one bucket of one key; pick
    * `bucketMicros` so the hottest key's busiest bucket fits a task. */
  def asofBucketed(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      rightVals: Map[String, String], rightTie: String,
      bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0)
    val attached = rightVals.values.toSeq
    def bucketOf(t: Column): Column = floor(unix_micros(t) / bucketMicros)

    val r = right.select(
      (Seq(col(rightKey).as("__k"), col(rightTime).as("__t"),
        lit(0).as("__side"), col(rightTie).cast("long").as("__tie")) ++
        rightVals.map { case (src, dst) => col(src).as(dst) }.toSeq): _*)
      .withColumn("__b", bucketOf(col("__t")))
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast("long"))
      .withColumn("__b", bucketOf(col("__t")))

    // 1. Per (key, bucket) and PER ATTACHED COLUMN: the value of the
    //    last right row whose value is non-null — mirroring the plain
    //    window's per-column last(..., ignoreNulls) semantics. A single
    //    whole-row max_by would let a trailing NULL value shadow an
    //    earlier non-null one inside the bucket.
    val stateAggs = attached.map(v => org.apache.spark.sql.functions.expr(
      s"max_by(`$v`, struct(__t, __tie)) FILTER (WHERE `$v` IS NOT NULL)")
      .as(v))
    val rState = r.groupBy(col("__k"), col("__b"))
      .agg(stateAggs.head, stateAggs.tail: _*)
      .withColumn("__o", lit(1))
    // 2. carry-in per left-occupied bucket: markers (order 0) see only
    //    strictly-earlier buckets' states (order 1) in the running window
    val lBuckets = l.select(col("__k"), col("__b")).distinct()
      .withColumn("__o", lit(0))
    val bucketTimeline = rState.unionByName(lBuckets, allowMissingColumns = true)
    val wb = Window.partitionBy(col("__k"))
      .orderBy(col("__b"), col("__o"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carryIn = attached.foldLeft(bucketTimeline) { (df, v) =>
      df.withColumn(v, last(col(v), ignoreNulls = true).over(wb))
    }.filter(col("__o") === 0).drop("__o")
    // 3. synthetic carry-in rows sort before every real row of their
    //    bucket (null time, side -1); then the original window, but
    //    partitioned by (key, BUCKET)
    val synth = carryIn.select(
      (Seq(col("__k"), col("__b"), lit(null).cast(l.schema("__t").dataType).as("__t"),
        lit(-1).as("__side"), lit(null).cast("long").as("__tie")) ++
        attached.map(col)): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
      .unionByName(synth, allowMissingColumns = true)
    val w = Window.partitionBy(col("__k"), col("__b"))
      .orderBy(col("__t").asc_nulls_first, col("__side"),
        col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withVals = attached.foldLeft(unioned) { (df, v) =>
      df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
    withVals.filter(col("__side") === 1)
      .drop("__k", "__t", "__side", "__tie", "__b")
  }

  /** Convenience: attach the matched right time itself. */
  def asofWithTime(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      rightVals: Map[String, String], rightTie: String,
      matchedTimeAs: String): DataFrame =
    asof(left, leftKey, leftTime,
      right.withColumn(matchedTimeAs, col(rightTime)),
      rightKey, rightTime, rightVals + (matchedTimeAs -> matchedTimeAs),
      rightTie)
}
