package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Bloom-screened incremental exact dedup: the screen must have no
  * false negatives (the composed output equals the plain exact join),
  * and the screening pass must be shuffle-free over the new batch. */
class BloomDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("bloom screen + exact confirm equals the plain fingerprint join") {
    val d = Tables.table(spark, sf, "documents")
    val idxDocs = d.filter(col("doc_id") % 5 =!= 0)
    val newBatch = d.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text"))
      .unionAll(idxDocs.filter(col("doc_id") % 7 === 3)
        .select((col("doc_id") + 100000).as("doc_id"), col("text")))
    val idxFps = DedupOps.fingerprintIndex(idxDocs, "doc_id", "text")
    val bloom = DedupOps.buildFingerprintBloom(idxDocs, "text", 200000)
    val screened = DedupOps.exactNewVsIndexBloom(
        newBatch, idxFps, "doc_id", "text", bloom)
      .as[(Long, Long)].collect().toSet
    // ground truth: plain join, no bloom
    val plain = newBatch
      .select(col("doc_id").as("id_new"),
        TextOps.fingerprint(col("text")).as("fp"))
      .join(idxFps, "fp")
      .select(col("id_new"), col("keeper"))
      .as[(Long, Long)].collect().toSet
    assert(plain.nonEmpty, "fixture produced no exact duplicates")
    assert(screened == plain,
      s"bloom screen lost or invented rows: ${screened.diff(plain)} / ${plain.diff(screened)}")
    // every re-crawled copy maps back to its original
    assert(plain.forall { case (idNew, keeper) => idNew - 100000 == keeper })
  }

  test("bloom membership has no false negatives and bounded false positives") {
    val d = Tables.table(spark, sf, "documents")
    val idxDocs = d.filter(col("doc_id") % 5 =!= 0)
    val bloom = DedupOps.buildFingerprintBloom(idxDocs, "text", 200000, fpp = 0.01)
    val fp = TextOps.fingerprint(col("text"))
    // every index fingerprint screens TRUE (the no-false-negative law)
    val missed = idxDocs
      .filter(!graft.functions.native.bloom_might_contain(fp, bloom))
      .count()
    assert(missed == 0, s"$missed index fingerprints screened false")
    // non-members mostly screen FALSE (md5 of a perturbed text is a
    // fresh fingerprint; at fpp=0.01 a handful of 400 may still pass)
    val nonMembers = idxDocs.select(concat(col("text"), lit(" xq"))
      .as("text"))
    val falsePos = nonMembers
      .filter(graft.functions.native.bloom_might_contain(fp, bloom))
      .count()
    val total = nonMembers.count()
    assert(falsePos <= math.max(5, total / 20),
      s"$falsePos/$total false positives — bloom is not filtering")
  }

  test("repeated-span windows: exact flags, short-doc guard, stride lever") {
    // docs 1 and 2 share the 4-token span "k l m n" (a 3-window run at
    // window=3); doc 3 is unrelated; doc 4 is shorter than the window
    val docs = Seq(
      (1L, "a b c k l m n x y"),
      (2L, "p q k l m n r s t"),
      (3L, "u v w u v w u v w"),
      (4L, "zz yy")).toDF("doc_id", "text")
    val flagged = DedupOps.repeatedSpanWindows(docs, "doc_id", "text",
        window = 3, minDocs = 2)
      .select("doc_id", "wfp").as[(Long, String)].collect()
    // the shared run "k l m" / "l m n" appears once per doc => 4 rows
    assert(flagged.length == 4, flagged.mkString(","))
    assert(flagged.map(_._1).toSet == Set(1L, 2L))
    // doc 3's within-doc repetition ("u v w" x3) is NOT cross-document
    // boilerplate (p18 owns within-doc repetition)
    val stats = DedupOps.repeatedSpanStats(docs, "doc_id", "text",
        window = 3, minDocs = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(stats == Seq(
      (1L, 7L, 2L, 2.0 / 7), (2L, 7L, 2L, 2.0 / 7),
      (3L, 7L, 0L, 0.0),
      // shorter than the window: zero windows, ratio 0 — with Spark's
      // descending-sequence footgun unguarded this doc would explode
      (4L, 0L, 0L, 0.0)))
    // stride 2 samples every other start: window count halves (ceil)
    val strided = DedupOps.repeatedSpanStats(docs, "doc_id", "text",
        window = 3, minDocs = 2, stride = 2)
      .filter(col("doc_id") === 1).select("n_windows")
      .as[Long].head()
    assert(strided == 4, s"stride=2 over 7 starts should keep 4: $strided")
  }

  test("the bloom screening pass is shuffle-free over the new batch") {
    val d = Tables.table(spark, sf, "documents")
    val bloom = DedupOps.buildFingerprintBloom(
      d.filter(col("doc_id") % 5 =!= 0), "text", 200000)
    val screen = d.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .filter(graft.functions.native.bloom_might_contain(col("fp"), bloom))
    val plan = screen.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bloom screen should be one per-row pass: $plan")
  }
}
