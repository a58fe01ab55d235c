package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** `topFractionByScore`: per-key quality-threshold selection via a
  * bounded score histogram + CDF walk — no corpus shuffle, no per-key
  * sort, bucket-granular deterministic semantics. */
class ThresholdSelectSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def kept(rows: Seq[(Long, String, Double)], fraction: Double,
      buckets: Int = 1000): Set[Long] =
    SampleOps.topFractionByScore(
        rows.toDF("id", "k", "score"), "k", "score", fraction, buckets)
      .select(col("id")).as[Long].collect().toSet

  test("keeps the top fraction per key by score") {
    val rows = (1 to 10).map(i => (i.toLong, "a", i / 10.0 - 0.05)) ++
      (11 to 20).map(i => (i.toLong, "b", (21 - i) / 10.0 - 0.05))
    // a: scores 0.05..0.95 ascending with id; top 30% of 10 = ids 8,9,10
    // b: scores 0.95..0.05 descending with id; top 30% = ids 11,12,13
    assert(kept(rows, 0.3) == Set(8L, 9L, 10L, 11L, 12L, 13L))
  }

  test("threshold-bucket ties are all admitted (>= target, never below)") {
    // coarse 10 buckets: ids 2 and 3 share bucket 5; target=ceil(0.25*4)=1
    // admits id 4 alone, but target=2 must take the WHOLE tied bucket
    val rows = Seq((1L, "a", 0.15), (2L, "a", 0.52), (3L, "a", 0.58),
      (4L, "a", 0.95))
    assert(kept(rows, 0.25, buckets = 10) == Set(4L))
    assert(kept(rows, 0.5, buckets = 10) == Set(2L, 3L, 4L))
  }

  test("fraction 1.0 keeps everything; score 1.0 lands in the top bucket") {
    val rows = Seq((1L, "a", 0.0), (2L, "a", 1.0), (3L, "b", 0.4))
    assert(kept(rows, 1.0) == Set(1L, 2L, 3L))
    assert(kept(rows, 0.5) contains 2L)
  }

  test("corpus is never shuffled: admit filter rides a broadcast join") {
    val df = (1 to 100).map(i => (i.toLong, s"k${i % 3}", i / 100.0))
      .toDF("id", "k", "score")
    val plan = SampleOps.topFractionByScore(df, "k", "score", 0.2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
