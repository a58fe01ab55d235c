package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Round-3 pipeline operators: repetition signals, PII redaction,
  * decontamination, sequence packing. */
class Round3OpsSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("repetition stats match a hand computation") {
    import spark.implicits._
    // "a b a b a": bigrams [a b, b a, a b, b a] -> 2 distinct of 4,
    // top freq 2; trigrams [a b a, b a b, a b a] -> 2 distinct of 3
    val df = Seq("a b a b a").toDF("text")
    val r = df.select(
      TextOps.dupNgramFraction(col("text"), 2).as("d2"),
      TextOps.dupNgramFraction(col("text"), 3).as("d3"),
      TextOps.topNgramFreq(col("text"), 2).as("tf"),
      TextOps.topNgramFraction(col("text"), 2).as("tr")).collect().head
    assert(r.getDouble(0) == 0.5)
    assert(r.getDouble(1) == 1.0 - 2.0 / 3.0)
    assert(r.getInt(2) == 2)
    assert(r.getDouble(3) == 0.5)
  }

  test("max_ngram_freq handles short docs and is order-insensitive") {
    import spark.implicits._
    val r = Seq("a", "a b", "x y x y x y").toDF("text")
      .select(TextOps.topNgramFreq(col("text"), 3).as("f"))
      .collect().map(_.getInt(0)).toSeq
    assert(r == Seq(0, 0, 2)) // trigrams of 6 tokens: "x y x" twice
  }

  test("PII redaction replaces every synthetic marker exactly once") {
    import spark.implicits._
    val df = Seq(
      "write to jane.doe+spam@sub.example.org or call +1-555-123-4567 at 192.168.0.1",
      "no pii here at all").toDF("t")
    val r = df.select(
      TextOps.piiCount(col("t"), TextOps.EmailPattern).as("e"),
      TextOps.piiCount(col("t"), TextOps.PhonePattern).as("p"),
      TextOps.piiCount(col("t"), TextOps.Ipv4Pattern).as("i"),
      TextOps.redactPii(col("t")).as("red")).collect()
    assert(r(0).getInt(0) == 1 && r(0).getInt(1) == 1 && r(0).getInt(2) == 1)
    assert(r(0).getString(3) ==
      "write to <EMAIL> or call <PHONE> at <IP>")
    assert(r(1).getInt(0) == 0 && r(1).getString(3) == "no pii here at all")
  }

  test("decontamination flags exactly the docs sharing benchmark n-grams") {
    val d = Tables.table(spark, sf, "documents")
    val bench = d.filter(col("doc_id") % 97 === 0)
    val sh = DedupOps.benchmarkShingles(bench, "text", 3)
    assert(sh.nonEmpty)
    val flagged = DedupOps.contaminationCounts(
      d.filter(col("doc_id") % 97 =!= 0), "doc_id", "text", sh, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    // brute-force reference via explode + join
    val benchSet = sh.toSet
    val ref = d.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), DedupOps.shingles(col("text"), 3).as("sh"))
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[String](1).count(benchSet.contains)))
      .filter(_._2 > 0).toMap
    assert(flagged == ref)
  }

  test("packing offsets equal the sequential prefix sum (and span chunks)") {
    val d = Tables.table(spark, sf, "documents")
    val got = PackingOps.packChunks(d, "doc_id",
        TextOps.tokenCount(col("text")), chunkTokens = 512, parts = 7)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val seq = d.select(col("doc_id"), TextOps.tokenCount(col("text")))
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong)).sortBy(_._1)
    var acc = 0L
    val want = seq.map { case (id, n) =>
      val s = acc; acc += n
      (id, n, s, s / 512, (s + n - 1) / 512)
    }
    assert(got.toSeq == want.toSeq)
    // the whole stream is covered without gaps
    assert(got.last._3 + got.last._2 == acc)
  }

  test("unigram LM scoring matches a hand computation (incl. OOV default)") {
    import spark.implicits._
    val df = Seq("a a b", "b c").toDF("text")
    val probs = LmOps.unigramProbs(df, "text")
    // counts: a=2, b=2, c=1, total=5
    assert(probs.toMap == Map("a" -> 0.4, "b" -> 0.4, "c" -> 0.2))
    val scored = df.select(LmOps.avgTokenProb(col("text"), probs).as("p"))
      .collect().map(_.getDouble(0)).toSeq
    assert(scored == Seq((0.4 + 0.4 + 0.4) / 3.0, (0.4 + 0.2) / 2.0))
    // unseen tokens score the default
    val oov = Seq("z z").toDF("text")
      .select(LmOps.avgTokenProb(col("text"), probs, default = 0.001))
      .collect().head.getDouble(0)
    assert(oov == 0.001)
    // topK capping keeps true probabilities over the full total
    val top = LmOps.unigramProbs(df, "text", topK = 2).toMap
    assert(top == Map("a" -> 0.4, "b" -> 0.4))
  }

  test("decontamination and LM scoring plans are shuffle-free over the corpus") {
    val d = Tables.table(spark, sf, "documents")
    val sh = DedupOps.benchmarkShingles(
      d.filter(col("doc_id") % 97 === 0), "text", 3)
    val screen = DedupOps.contaminationCounts(
      d.filter(col("doc_id") % 97 =!= 0), "doc_id", "text", sh, 3)
    val screenPlan = screen.queryExecution.executedPlan.toString
    assert(!screenPlan.contains("Exchange"),
      s"decontamination screen should be one per-row pass: $screenPlan")
    val probs = LmOps.unigramProbs(d, "text")
    val scored = d.select(LmOps.avgTokenProb(col("text"), probs))
    val scorePlan = scored.queryExecution.executedPlan.toString
    assert(!scorePlan.contains("Exchange"),
      s"LM scoring should be one per-row pass: $scorePlan")
  }

  test("int8 quantization stays in range and bounds reconstruction error") {
    val e = Tables.table(spark, sf, "embeddings")
    val (scale, q) = VectorOps.quantizeInt8(col("embedding"))
    val rows = e.select(col("embedding"), scale.as("s"), q.as("q")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val emb = r.getSeq[Float](0)
      val s = r.getDouble(1)
      val qs = r.getSeq[Int](2)
      assert(qs.forall(v => v >= -127 && v <= 127), "q out of int8 range")
      if (s > 0) {
        val maxErr = emb.zip(qs).map { case (x, v) =>
          math.abs(x.toDouble - v / s)
        }.max
        assert(maxErr <= 0.5 / s + 1e-12,
          s"reconstruction error $maxErr exceeds the quantization step")
      }
    }
  }

  test("packing is independent of the partition count") {
    val d = Tables.table(spark, sf, "documents")
    def run(p: Int) = PackingOps.packChunks(d, "doc_id",
        TextOps.tokenCount(col("text")), 512, parts = p)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(run(1) == run(13))
  }
}
