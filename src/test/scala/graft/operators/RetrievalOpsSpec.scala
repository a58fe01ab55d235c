package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** BM25 retrieval + reciprocal-rank fusion (p51/p52). */
class RetrievalOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "spark spark spark runs fast"),
      (2L, "spark runs on a cluster"),
      (3L, "ducks swim on a pond"),
      (4L, "spark cluster cluster cluster jobs"),
      (5L, "a very long document about nothing in particular with many words"))
      .toDF("doc_id", "text")
  }

  test("bm25 ranks higher-tf docs first and ignores non-query terms") {
    val out = RetrievalOps.bm25TopK(corpus, "doc_id", "text",
        Seq(1 -> "spark"), k = 10)
      .orderBy(col("rank")).collect()
    // docs 1, 2, 4 contain "spark"; doc 1 has tf=3 in a 5-token doc;
    // docs 2 and 4 tie exactly (tf=1, dl=5) -> doc_id breaks the tie
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 4L))
    // scores are non-increasing; the 2/4 pair is an exact tie
    val scores = out.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(scores(0) > scores(1) && scores(1) == scores(2))
  }

  test("rarer query terms outweigh common ones (idf)") {
    // "pond" appears in 1 doc, "spark" in 3 — a pond doc must beat a
    // single-mention spark doc for the combined query
    val out = RetrievalOps.bm25TopK(corpus, "doc_id", "text",
        Seq(1 -> "spark pond"), k = 10)
      .orderBy(col("rank")).collect()
    assert(out.head.getLong(1) == 3L)
  }

  test("bm25 score is repartition-invariant (sorted-term fold)") {
    val a = RetrievalOps.bm25TopK(corpus, "doc_id", "text",
      Seq(1 -> "spark cluster fast"), k = 10).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val b = RetrievalOps.bm25TopK(corpus.repartition(7), "doc_id", "text",
      Seq(1 -> "spark cluster fast"), k = 10).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(a == b) // bit-exact, not approximately equal
  }

  test("multiple queries rank independently") {
    val out = RetrievalOps.bm25TopK(corpus, "doc_id", "text",
        Seq(1 -> "spark", 2 -> "pond swim"), k = 2)
      .collect().map(r => (r.getInt(0), r.getInt(3)) -> r.getLong(1)).toMap
    assert(out((1, 1)) == 1L)
    assert(out((2, 1)) == 3L)
  }

  test("rrfFuse merges ranks, handles docs absent from one list") {
    import spark.implicits._
    val a = Seq((1, 10L, 1), (1, 20L, 2)).toDF("qid", "doc_id", "rank")
    val b = Seq((1, 20L, 1), (1, 30L, 2)).toDF("qid", "doc_id", "rank")
    val out = RetrievalOps.rrfFuse(a, b, kRrf = 60, topK = 10)
      .orderBy(col("rank")).collect()
    val fused = out.map(r => r.getLong(1) -> r.getDouble(4)).toMap
    // doc 20: in both lists (rank 2 + rank 1)
    assert(fused(20L) == 1.0 / 62 + 1.0 / 61)
    assert(fused(10L) == 1.0 / 61)
    assert(fused(30L) == 1.0 / 62)
    // fusion order: 20 (two votes) beats both single-vote docs
    assert(out.map(_.getLong(1)).toSeq == Seq(20L, 10L, 30L))
    // absent ranks surface as nulls, not zeros
    assert(out.find(_.getLong(1) == 10L).get.isNullAt(3))
  }

  test("qualityTopK is bounded and deterministically ordered") {
    val out = RetrievalOps.qualityTopK(corpus, "doc_id", "text", k = 3)
      .collect()
    assert(out.length == 3)
    assert(out.map(_.getInt(1)).toSeq == Seq(1, 2, 3))
    // rerun gives the identical list (no rand, no partition order dep)
    val again = RetrievalOps.qualityTopK(corpus.repartition(5), "doc_id",
      "text", k = 3).collect()
    assert(out.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
  }
}
