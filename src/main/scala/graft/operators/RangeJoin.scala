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
  def pointInInterval(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    val p = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val iv = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        // hi is exclusive, so the last covered bucket is floor((hi-ulp)/w)
        // = ceil(hi/w)-1 for ANY numeric bound type (integer or fractional);
        // greatest(...) keeps sequence() well-formed for empty intervals
        // (hi <= lo), whose spurious bucket the residual filter removes.
        greatest(floor(col(loCol) / bucketWidth),
          ceil(col(hiCol) / bucketWidth) - lit(1)).cast("long"))))
    p.join(iv, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }
}
