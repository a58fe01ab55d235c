package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Vocabulary coverage curve: top-k token frequencies with cumulative
  * corpus coverage — rank order, tie-breaks, and the coverage
  * denominator (ALL corpus tokens, not just the top-k). */
class VocabCoverageSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("curve ranks by count with deterministic tie-breaks") {
    // counts: the=3, a=2, b=2, z=1  (a before b on the tie)
    val df = Seq("the a b", "the a b", "the z").toDF("text")
    val rows = LmOps.vocabCoverage(df, "text", k = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.toSeq == Seq(
      (1, "the", 3L, 3L, 3.0 / 8),
      (2, "a", 2L, 5L, 5.0 / 8),
      (3, "b", 2L, 7L, 7.0 / 8)))
  }

  test("coverage denominator is the FULL corpus, k only truncates the curve") {
    val df = Seq("x x x y z w").toDF("text")
    val top1 = LmOps.vocabCoverage(df, "text", k = 1).collect().head
    assert(top1.getString(1) == "x" && top1.getDouble(4) == 3.0 / 6)
  }

  test("top-k is a TakeOrdered of the aggregated table, never a global sort") {
    val df = (1 to 50).map(i => s"tok$i the a").toDF("text")
    val plan = LmOps.vocabCoverage(df, "text", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
