package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** DSIR-style importance weighting (p57): the rational-form ratio
  * table must match a direct recomputation from raw counts, stay
  * bounded by topK, and the per-doc scoring pass must be shuffle-free
  * (the corpus is touched once against the broadcast table). */
class DsirImportanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def d = Tables.table(spark, sf, "documents")
  private def inTarget = col("source").isin("src1", "src2")

  test("ratio table matches direct recomputation from counts") {
    val target = d.filter(inTarget)
    val raw = d.filter(!inTarget)
    val got = LmOps.importanceRatios(target, raw, "text", topK = 8).toMap

    def counts(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.select(explode(split(col("text"), " ")).as("t"))
        .groupBy("t").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (tc, rc) = (counts(target), counts(raw))
    val (nt, nr) = (tc.values.sum, rc.values.sum)
    val kept = tc.toSeq.sortBy { case (t, c) => (-c, t) }.take(8)
    val want = kept.map { case (t, c) =>
      t -> ((c + 1).toDouble * (nr + 8).toDouble /
        ((rc.getOrElse(t, 0L) + 1).toDouble * (nt + 8).toDouble))
    }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (t, r) => assert(r == want(t), s"token $t") }
    assert(got.size <= 8)
  }

  test("target-heavy tokens score above 1, raw-only tokens below") {
    val ratios = LmOps.importanceRatios(
      d.filter(inTarget), d.filter(!inTarget), "text", topK = 64)
    assert(ratios.exists(_._2 > 1.0) && ratios.exists(_._2 < 1.0),
      "fixture must produce both target-leaning and raw-leaning tokens")
  }

  test("per-doc scoring plan is shuffle-free") {
    val ratios = LmOps.importanceRatios(
      d.filter(inTarget), d.filter(!inTarget), "text", topK = 16)
    val scored = d.select(col("doc_id"),
      graft.functions.native.token_score_sum(
        split(col("text"), " "), ratios, 0.0).as("s"))
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"plan: $plan")
  }

  test("uncapped vocabulary is refused (driver-bound contract)") {
    intercept[IllegalArgumentException] {
      LmOps.importanceRatios(d.filter(inTarget), d.filter(!inTarget),
        "text", topK = 0)
    }
  }
}
