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
