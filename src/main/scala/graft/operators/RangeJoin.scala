package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join — the second classic operator Spark
  * lacks a dedicated physical strategy for. A naive
  * `points.join(intervals, p >= lo && p < hi)` plans as
  * BroadcastNestedLoopJoin: O(|points|·|intervals|) and a broadcast of
  * a whole side — unusable at 100 TB.
  *
  * Bucketed form: intervals explode to the fixed-width buckets they
  * cover, points map to their bucket, and the join is a hash
  * EQUI-join on the bucket id with the exact range as a residual
  * filter. One shuffle, work ∝ |points| + Σ interval-widths/bucket.
  * Pick `bucketWidth` near the median interval width so most
  * intervals explode to O(1) buckets.
  */
object RangeJoin {

  /** @param points    (pointCol, ...) — kept in full
    * @param intervals (loCol, hiCol, ...) — interval is [lo, hi)
    * @param bucketWidth fixed bucket width in the point's units */
  /** floor(x/w) as a bucket id — EXACT for integral columns via
    * (x - pmod(x, w)) div w (a double-rounded division misplaces buckets
    * beyond 2^53 and silently drops matches); double floor otherwise. */
  private def bucketExpr(df: DataFrame, c: String, w: Long): Column =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType =>
        expr(s"(CAST(`$c` AS BIGINT) - pmod(CAST(`$c` AS BIGINT), ${w}L)) div ${w}L")
      case _ => floor(col(c) / w).cast("long")
    }

  def pointInInterval(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    val p = points.withColumn("__bucket",
      bucketExpr(points, pointCol, bucketWidth))
    // hi is exclusive, so the last covered bucket is floor((hi-ulp)/w):
    // for integral hi that is bucket(hi-1), for fractional ceil(hi/w)-1;
    // greatest(...) keeps sequence() well-formed for empty intervals
    // (hi <= lo), whose spurious bucket the residual filter removes.
    val endBucket = intervals.schema(hiCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType =>
        expr(s"""(CAST(`$hiCol` AS BIGINT) - 1
                | - pmod(CAST(`$hiCol` AS BIGINT) - 1, ${bucketWidth}L))
                | div ${bucketWidth}L""".stripMargin)
      case _ => (ceil(col(hiCol) / bucketWidth) - lit(1)).cast("long")
    }
    val iv = intervals.withColumn("__bucket",
      explode(sequence(
        bucketExpr(intervals, loCol, bucketWidth),
        greatest(bucketExpr(intervals, loCol, bucketWidth), endBucket))))
    p.join(iv, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }
}
