package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Round-9 operator specs: the hash-collapsed hamming banding (m14's
  * quadratic fix — identical hashes collapse to one banded row, pairs
  * re-expand output-proportionally), the relative candidate budget in
  * LshJoin, and the bit-mask source-overlap rewrite (p60). */
class Round9OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- hash-collapsed hamming banding -----------------------------------

  /** brute force oracle: all pairs with hamming ≤ maxDist */
  private def bruteHamming(hs: Seq[(Long, Long)], maxDist: Int) =
    (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= maxDist
    } yield (a, b, d)).toSet

  test("bandedHammingPairs == brute force on a LOW-ENTROPY hash set " +
      "(the shape that was quadratic before the collapse)") {
    // 60 assets over only 5 distinct hashes, all within hamming ≤ 3 of
    // each other except one far group — the old per-asset banding put
    // all 60 into the same chunk buckets; the collapsed path bands 5
    val near = Seq(0L, 1L, 3L, 1L << 20, (1L << 20) | 1L)
    val hs = (0 until 60).map(i => (i.toLong, near(i % 5))) ++
      Seq((100L, 0x0FFFFFFFFFFFFFL))
    val got = graft.multimodal.MultimodalOps
      .audioNearDupPairs(hs.toDF("asset_id", "ahash"), maxDist = 3)
      .as[(Long, Long, Int)].collect()
    assert(got.length == got.toSet.size, "no duplicate pairs")
    assert(got.toSet == bruteHamming(hs, 3))
  }

  test("bandedHammingPairs recall holds at each hamming distance 0..3") {
    val base = 0x00FF00FF00FF00L & 0x00FFFFFFFFFFFFFFL
    val hs = Seq(
      (1L, base), (2L, base),                     // d=0
      (3L, base ^ (1L << 5)),                     // d=1 vs 1/2
      (4L, base ^ ((1L << 5) | (1L << 20))),      // d=2 vs 1/2
      (5L, base ^ ((1L << 5) | (1L << 20) | (1L << 41)))) // d=3 vs 1/2
    val got = graft.multimodal.MultimodalOps
      .audioNearDupPairs(hs.toDF("asset_id", "ahash"), maxDist = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == bruteHamming(hs, 3))
  }

  // ---- LshJoin.candidatesBudgeted ----------------------------------------

  test("candidatesBudgeted: relative cap tightens with banded volume " +
      "but never below the 64 floor") {
    // one hot bucket of 80 ids + one cold pair: floor(64) < 80, so with
    // a tiny budget the hot bucket must be DROPPED once n makes
    // 2*budget/n < 80 (the cold pair keeps the result non-empty so AQE
    // cannot prune the CollectMetrics node with an empty subtree)
    val hot = ((1L to 80L).map(i => (i, 0, 0)) ++
      Seq((90L, 1, 1), (91L, 1, 1))).toDF("id", "chunk", "ck")
    val obs = org.apache.spark.sql.Observation()
    val got = LshJoin.candidatesBudgeted(hot, Seq("chunk", "ck"),
      maxBucket = 10000, candidateBudget = 100, skewObs = Some(obs))
      .as[(Long, Long)].collect().toSet
    // 82 banded rows, cap = max(64, 200/82=2) = 64 < 80 -> hot dropped
    assert(got == Set((90L, 91L)))
    val m = org.apache.spark.sql.graftbridge.Bridge.observationMetrics(obs)
    assert(m("dropped_buckets") == 1L && m("dropped_ids") == 80L)
    assert(m("max_bucket_size") == 80 && m("bucket_cap") == 64L)
  }

  test("candidatesBudgeted: generous budget keeps the absolute-cap " +
      "behavior (all pairs of a shared bucket)") {
    val b = Seq((1L, 0, 7), (2L, 0, 7), (3L, 0, 7), (4L, 1, 9))
      .toDF("id", "chunk", "ck")
    val got = LshJoin.candidatesBudgeted(b, Seq("chunk", "ck"),
      maxBucket = 10000, candidateBudget = 1000000)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  // ---- bit-mask source overlap -------------------------------------------

  test("sourceOverlap: bit_or mask plan matches hand-computed matrix") {
    // srcA: {x y, y z}; srcB: {y z, z w}; srcC: {q r}
    // 3-shingles with n=2 words... use n=2 shingles over 2-word docs ->
    // each doc is ONE shingle
    val df = Seq(
      ("A", "x y"), ("A", "y z"),
      ("B", "y z"), ("B", "z w"),
      ("C", "q r")).toDF("source", "text")
    val got = DedupOps.sourceOverlap(df, "source", "text", n = 2)
      .as[(String, String, Long, Long, Long, Double)].collect().toSet
    // pairs that share NO shingle never materialize (same as the set
    // spelling: no mask/set ever contains both bits), so (A,C)/(B,C)
    // are absent rather than zero rows
    assert(got == Set(("A", "B", 1L, 2L, 2L, 1.0 / 3.0)))
  }

  test("sourceOverlap: duplicate shingles within one source count once") {
    val df = Seq(("A", "x y"), ("A", "x y"), ("B", "x y"))
      .toDF("source", "text")
    val got = DedupOps.sourceOverlap(df, "source", "text", n = 2)
      .as[(String, String, Long, Long, Long, Double)].collect().toSet
    assert(got == Set(("A", "B", 1L, 1L, 1L, 1.0)))
  }
}
