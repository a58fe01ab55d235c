package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Semantic decontamination (p56): the per-row folded-eval screen must
  * equal the explicit crossJoin-then-argmax computation, and its plan
  * must be join-free and shuffle-free over the corpus — the property
  * that makes it a single-pass scan at 100 TB. */
class SemanticDecontamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def vecs = Tables.table(spark, sf, "embeddings")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("folded-eval screen equals explicit crossJoin argmax") {
    val evalSet = vecs.filter(col("id") % 41 === 0)
    val corpus = vecs.filter(col("id") % 41 =!= 0)
    val tau = 0.25
    val got = VectorOps.semanticContamination(corpus, evalSet, tau)
      .orderBy(col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e12)))

    val e = evalSet.select(col("id").as("eval_id"), col("vec").as("ev"))
    val scored = corpus.crossJoin(e)
      .withColumn("cosine", VectorOps.cosine(col("vec"), col("ev")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("cosine").desc, col("eval_id"))
    val want = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("cosine") >= tau)
      .select(col("id"), col("eval_id"), col("cosine"))
      .orderBy(col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e12)))

    assert(got.nonEmpty && got.sameElements(want))
  }

  test("plan is join-free and shuffle-free over the corpus") {
    val screen = VectorOps.semanticContamination(
      vecs.filter(col("id") % 41 =!= 0), vecs.filter(col("id") % 41 === 0),
      tau = 0.25)
    val plan = screen.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"plan: $plan")
    assert(!plan.contains("Exchange"), s"plan: $plan")
  }

  test("empty eval set is refused loudly") {
    intercept[IllegalArgumentException] {
      VectorOps.semanticContamination(vecs, vecs.filter(col("id") < 0), 0.3)
    }
  }
}
