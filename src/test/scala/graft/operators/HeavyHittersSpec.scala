package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Misra-Gries heavy hitters (p54): exact top-k without the
  * full-vocabulary shuffle. */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("matches the exact groupBy top-k when the guarantee holds") {
    import spark.implicits._
    // skewed corpus: token "hot_i" appears (50-i) times, plus a long
    // unique tail the sketch must not let crowd out the hitters
    val docs = ((0 until 20).flatMap(i =>
      Seq.fill(50 - i)(s"hot$i")) ++ (0 until 3000).map(i => s"tail$i"))
      .grouped(25).zipWithIndex
      .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val mg = LmOps.heavyHitters(docs, "text", k = 10, counters = 512)
      .collect()
    val exact = docs.select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("t")).limit(10).collect()
    assert(mg.map(r => (r.getString(1), r.getLong(2))).toSeq ==
      exact.map(r => (r.getString(0), r.getLong(1))).toSeq)
    assert(mg.forall(_.getBoolean(3)), "guarantee must hold on this corpus")
    assert(mg.map(_.getInt(0)).toSeq == (1 to 10))
  }

  test("result is partitioning-invariant (exact recount, not sketch counts)") {
    import spark.implicits._
    val docs = (0 until 200).map(i =>
      (i.toLong, s"alpha beta w$i ${if (i % 3 == 0) "gamma" else "delta"}"))
      .toDF("doc_id", "text")
    val a = LmOps.heavyHitters(docs, "text", k = 4, counters = 64)
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    val b = LmOps.heavyHitters(docs.repartition(13), "text", k = 4,
      counters = 64).collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(a == b)
  }

  test("guarantee_ok goes false when counters are too small to certify") {
    import spark.implicits._
    // near-uniform corpus: with only 4 counters nothing clears N/4
    val docs = (0 until 400).map(i => (i.toLong, s"t${i % 100}"))
      .toDF("doc_id", "text")
    val out = LmOps.heavyHitters(docs, "text", k = 3, counters = 4).collect()
    assert(out.forall(!_.getBoolean(3)))
  }
}
