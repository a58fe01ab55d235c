package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Round-8 operator specs: integer-exact PageRank, incremental
  * connected components (Δ-fold == full recompute, empty-Δ
  * passthrough), and the audio near-dup banding recall guarantee. */
class Round8OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- GraphOps.pageRank ------------------------------------------------

  test("pageRank: hand-checked 3-node cycle, exact Long arithmetic") {
    // cycle 1->2->3->1: every node has out_deg 1, so ranks stay equal
    // at every iteration; replay the exact arithmetic
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val got = GraphOps.pageRank(e, "s", "d", iters = 4)
      .as[(Long, Long)].collect().toMap
    val unit = 1000000000L
    val base = unit * 15 / 100 / 3
    var r = unit / 3
    for (_ <- 1 to 4) r = base + (r * 85) / 100 // share = r/1 per node
    assert(got == Map(1L -> r, 2L -> r, 3L -> r))
  }

  test("pageRank: star graph concentrates rank on the hub, determinism") {
    // 1..6 -> 0: node 0 gets all inbound mass, leaves only base
    val e = (1L to 6L).map(i => (i, 0L)).toDF("s", "d")
    val a = GraphOps.pageRank(e, "s", "d", iters = 3)
      .as[(Long, Long)].collect().toMap
    val b = GraphOps.pageRank(e, "s", "d", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(a == b, "integer ranks must be bit-identical across runs")
    val unit = 1000000000L
    val base = unit * 15 / 100 / 7
    assert((1L to 6L).forall(i => a(i) == base),
      "leaves (no inbound) hold exactly the base mass")
    assert(a(0L) > a(1L) * 5, "hub dominates")
  }

  test("pageRank: total mass never exceeds unit (dangling leak only)") {
    // dangling node 3 (no out-edges) leaks its damped mass each round
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("s", "d")
    val total = GraphOps.pageRank(e, "s", "d", iters = 5)
      .agg(sum("rank_units")).head.getLong(0)
    assert(total > 0 && total <= 1000000000L,
      s"mass $total out of bounds — dangling leak must only shrink it")
  }

  test("pageRank: self-loops and duplicate edges are dropped") {
    val e = Seq((1L, 1L), (1L, 2L), (1L, 2L), (2L, 1L)).toDF("s", "d")
    val clean = Seq((1L, 2L), (2L, 1L)).toDF("s", "d")
    val a = GraphOps.pageRank(e, "s", "d").as[(Long, Long)].collect().toMap
    val b = GraphOps.pageRank(clean, "s", "d").as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("pageRank: invalid checkpointEvery is rejected up front") {
    val e = Seq((1L, 2L)).toDF("s", "d")
    intercept[IllegalArgumentException] {
      GraphOps.pageRank(e, "s", "d", checkpointEvery = 0)
    }
    intercept[IllegalArgumentException] {
      GraphOps.pageRank(e, "s", "d", checkpointEvery = -3)
    }
  }

  test("pageRank: checkpointed iteration count matches unchckpointed") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("s", "d")
    val a = GraphOps.pageRank(e, "s", "d", iters = 6, checkpointEvery = 2)
      .as[(Long, Long)].collect().toMap
    val b = GraphOps.pageRank(e, "s", "d", iters = 6, checkpointEvery = 100)
      .as[(Long, Long)].collect().toMap
    assert(a == b, "lineage cutting must not change any rank")
  }

  test("personalizedPageRank: mass flows only from the seed set") {
    // chain 1 -> 2 -> 3, seed {1}: node 1 holds base (nothing inbound),
    // 2 inherits from 1, 3 from 2; replay the exact Long arithmetic
    val e = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val got = GraphOps.personalizedPageRank(e, "s", "d", seeds, "node",
      iters = 3).as[(Long, Long)].collect().toMap
    val unit = 1000000000L
    val base = unit * 15 / 100 / 1 // |seeds| = 1
    var r1 = unit / 1
    var r2 = 0L
    var r3 = 0L
    for (_ <- 1 to 3) {
      val n1 = base
      val n2 = (r1 / 1) * 85 / 100 // inbound share from 1
      val n3 = (r2 / 1) * 85 / 100
      r1 = n1; r2 = n2; r3 = n3
    }
    assert(got == Map(1L -> r1, 2L -> r2, 3L -> r3))
  }

  test("personalizedPageRank: seeds outside the graph are ignored; " +
      "all-foreign seed set throws") {
    val e = Seq((1L, 2L), (2L, 1L)).toDF("s", "d")
    val mixed = Seq(1L, 99L).map(Tuple1(_)).toDF("node")
    val onlySeed1 = Seq(Tuple1(1L)).toDF("node")
    val a = GraphOps.personalizedPageRank(e, "s", "d", mixed, "node")
      .as[(Long, Long)].collect().toMap
    val b = GraphOps.personalizedPageRank(e, "s", "d", onlySeed1, "node")
      .as[(Long, Long)].collect().toMap
    assert(a == b, "a foreign seed must not change the teleport scope")
    val foreign = Seq(Tuple1(99L)).toDF("node")
    intercept[IllegalArgumentException] {
      GraphOps.personalizedPageRank(e, "s", "d", foreign, "node")
    }
  }

  test("personalizedPageRank with all nodes as seeds equals pageRank") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("s", "d")
    val allNodes = Seq(1L, 2L, 3L).map(Tuple1(_)).toDF("node")
    val a = GraphOps.personalizedPageRank(e, "s", "d", allNodes, "node",
      iters = 4).as[(Long, Long)].collect().toMap
    val b = GraphOps.pageRank(e, "s", "d", iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  // ---- ClusterOps.incrementalComponents ---------------------------------

  private def fullCc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ClusterOps.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("incremental fold equals full recompute (merge + new nodes)") {
    val priorEdges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
    val prior = ClusterOps.connectedComponents(
      priorEdges.toDF("a", "b"), "a", "b")
    // Δ merges {1,2,3} with {10,11}, admits new nodes 30/31, leaves
    // {20,21} untouched
    val delta = Seq((3L, 10L), (30L, 31L)).toDF("a", "b")
    val got = ClusterOps.incrementalComponents(prior, delta, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == fullCc(priorEdges ++ Seq((3L, 10L), (30L, 31L))))
  }

  test("empty delta returns the prior map unchanged (quiet-day path)") {
    val prior = ClusterOps.connectedComponents(
      Seq((1L, 2L), (5L, 6L)).toDF("a", "b"), "a", "b")
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val got = ClusterOps.incrementalComponents(prior, empty, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("connectedComponents tolerates an empty edge set") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(ClusterOps.connectedComponents(empty, "a", "b").count() == 0)
  }

  test("delta touching one component leaves the others' rows identical") {
    val priorEdges = Seq((1L, 2L), (10L, 11L), (20L, 21L))
    val prior = ClusterOps.connectedComponents(
      priorEdges.toDF("a", "b"), "a", "b")
    val delta = Seq((2L, 100L)).toDF("a", "b")
    val got = ClusterOps.incrementalComponents(prior, delta, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got(10L) == 10L && got(11L) == 10L &&
      got(20L) == 20L && got(21L) == 20L, "untouched components intact")
    assert(got(100L) == 1L, "new node joins the touched component")
  }

  // ---- audio near-dup banding -------------------------------------------

  test("audioNearDupPairs: identical hashes pair at hamming 0; " +
      "far hashes never pair") {
    val hashes = Seq(
      (1L, 0x12345678901234L), (2L, 0x12345678901234L), // identical
      (3L, 0x12345678901234L ^ 0x3L),                   // hamming 2
      (4L, 0x7FFFFFFFFFFFFFL)                           // far
    ).toDF("asset_id", "ahash")
    val pairs = graft.multimodal.MultimodalOps
      .audioNearDupPairs(hashes, maxDist = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set((1L, 2L, 0), (1L, 3L, 2), (2L, 3L, 2)))
  }

  test("audioNearDupPairs: maxDist above the pigeonhole bound throws") {
    val hashes = Seq((1L, 1L)).toDF("asset_id", "ahash")
    intercept[IllegalArgumentException] {
      graft.multimodal.MultimodalOps.audioNearDupPairs(hashes, maxDist = 4)
        .collect()
    }
  }
}
