package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Round-7 operators: mixture sampling to a token budget, deterministic
  * epoch shuffle/shard, bigram-LM quality bucketing, cluster-balanced
  * diversity sampling. */
class Round7OpsSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark
  private def docs = Tables.table(spark, sf, "documents")
  private def vecs = Tables.table(spark, sf, "embeddings")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  // ---- mixtureSample -------------------------------------------------

  private def mixed(budget: Long) = SampleOps.mixtureSample(
    docs.select(col("doc_id"), col("source"),
      TextOps.tokenCount(col("text")).cast("long").as("n_tok")),
    idCol = "doc_id", sourceCol = "source", tokenCount = col("n_tok"),
    weights = Map("src0" -> 0.5), budgetTokens = budget,
    defaultWeight = 0.05)

  test("mixtureSample caps rates at 1.0 and keeps full sources intact") {
    // src0 gets half of a budget far above the corpus's token total:
    // rate must cap at exactly 1.0 and every src0 doc must survive
    val m = mixed(budget = 10000000L)
    val src0Rates = m.filter(col("source") === "src0")
      .select("rate").distinct().collect().map(_.getDouble(0))
    assert(src0Rates.sameElements(Array(1.0)), s"expected capped rate, got ${src0Rates.toSeq}")
    val src0All = docs.filter(col("source") === "src0").count()
    assert(m.filter(col("source") === "src0").count() == src0All)
  }

  test("mixtureSample downsamples toward the weighted token share") {
    val tokTotal = docs.select(sum(TextOps.tokenCount(col("text")).cast("long")))
      .collect().head.getLong(0)
    val budget = tokTotal / 4
    val m = mixed(budget).cache()
    try {
      // every per-source kept-token total must be near rate·tokens_s:
      // hash-threshold sampling is uniform, so allow statistical slack
      val kept = m.agg(sum("n_tok")).collect().head.getLong(0)
      assert(kept < tokTotal, "a fractional budget must drop rows")
      // determinism: the identical call selects the identical rows
      val a = m.select("doc_id").collect().map(_.getLong(0)).toSet
      val b = mixed(budget).select("doc_id").collect().map(_.getLong(0)).toSet
      assert(a == b)
    } finally m.unpersist()
  }

  test("mixtureEpochs upsamples scarce sources and downsamples the rest") {
    val base = docs.select(col("doc_id"), col("source"),
      TextOps.tokenCount(col("text")).cast("long").as("n_tok"))
    val tokSrc0 = base.filter(col("source") === "src0")
      .agg(sum("n_tok")).collect().head.getLong(0)
    // src0 gets a budget share of 4x its own tokens -> rate 4.0-ish:
    // every src0 doc must carry >= 4 copies (4 full epochs + maybe a
    // fractional 5th); the default-weight tail gets a rate < 1 ->
    // n_copies exactly 1 for a strict subset
    val m = SampleOps.mixtureEpochs(base, "doc_id", "source", col("n_tok"),
      weights = Map("src0" -> 1.0), budgetTokens = tokSrc0 * 4,
      defaultWeight = 0.001).cache()
    try {
      val src0 = m.filter(col("source") === "src0")
      assert(src0.count() == base.filter(col("source") === "src0").count(),
        "rate >= 1 must keep every doc")
      val copies = src0.select("n_copies").collect().map(_.getLong(0))
      assert(copies.forall(c => c == 4L || c == 5L), copies.toSeq.distinct.toString)
      // token accounting: sum(n_copies * n_tok) lands near rate * tokens
      val served = src0.select(sum(col("n_copies") * col("n_tok")))
        .collect().head.getLong(0)
      assert(math.abs(served - tokSrc0 * 4L) < tokSrc0,
        s"served $served vs target ${tokSrc0 * 4}")
      val tail = m.filter(col("source") =!= "src0")
      assert(tail.select("n_copies").distinct().collect()
        .map(_.getLong(0)).toSeq == Seq(1L),
        "fractional-rate sources carry exactly 1 copy")
      assert(tail.count() < base.filter(col("source") =!= "src0").count(),
        "a rate < 1 source must drop rows")
    } finally m.unpersist()
  }

  // ---- epochShuffle --------------------------------------------------

  test("epochShuffle: shards in range, deterministic, epoch-dependent") {
    val ids = docs.select(col("doc_id"))
    val e1 = SampleOps.epochShuffle(ids, "doc_id", epoch = 1, nShards = 8)
    val rows = e1.collect()
    assert(rows.forall { r =>
      val s = r.getInt(r.fieldIndex("shard")); s >= 0 && s < 8 })
    // reproducible: same epoch, same assignment
    val again = SampleOps.epochShuffle(ids, "doc_id", epoch = 1, nShards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(rows.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet == again)
    // a new epoch is a genuinely different permutation: the within-
    // shard order keys must disagree for most rows
    val e2 = SampleOps.epochShuffle(ids, "doc_id", epoch = 2, nShards = 8)
    val moved = e1.select(col("doc_id"), col("sort_key").as("k1"))
      .join(e2.select(col("doc_id"), col("sort_key").as("k2")), "doc_id")
      .filter(col("k1") =!= col("k2")).count()
    assert(moved > rows.length * 0.9,
      s"epoch 2 should re-key nearly all rows, moved only $moved/${rows.length}")
  }

  test("epochShuffle spreads rows roughly evenly over shards") {
    val counts = SampleOps.epochShuffle(
        docs.select(col("doc_id")), "doc_id", epoch = 3, nShards = 8)
      .groupBy("shard").count().collect().map(_.getLong(1))
    assert(counts.length == 8, "every shard should receive rows")
    val (mn, mx) = (counts.min, counts.max)
    assert(mx < mn * 3, s"shard skew too high: min=$mn max=$mx")
  }

  // ---- bigrams / bigram LM -------------------------------------------

  test("bigrams and bigramCount handle the degenerate shapes") {
    import spark.implicits._
    val df = Seq("a b c", "solo", "x y").toDF("text")
    val got = df.select(TextOps.bigrams(col("text"))).collect()
      .map(_.getSeq[String](0).toList)
    assert(got.toList == List(List("a b", "b c"), Nil, List("x y")))
    val counts = df.select(TextOps.bigramCount(col("text"))).collect()
      .map(_.getInt(0)).toList
    assert(counts == List(2, 0, 1))
  }

  test("bigram model probabilities sum the corpus correctly") {
    import spark.implicits._
    val df = Seq("a b a b", "a b c").toDF("text")
    // bigrams: (a b) x3? -> "a b","b a","a b" + "a b","b c" = a b:3, b a:1, b c:1
    val probs = LmOps.bigramProbs(df, "text", topK = 0).toMap
    assert(probs("a b") == 3.0 / 5 && probs("b a") == 1.0 / 5 && probs("b c") == 1.0 / 5)
    val scored = df.select(LmOps.avgBigramProb(col("text"),
      probs.toSeq.sorted).as("p")).collect().map(_.getDouble(0))
    // doc1: (3/5 + 1/5 + 3/5)/3 ; doc2: (3/5 + 1/5)/2
    assert(math.abs(scored(0) - (3.0/5 + 1.0/5 + 3.0/5) / 3) < 1e-15)
    assert(math.abs(scored(1) - (3.0/5 + 1.0/5) / 2) < 1e-15)
    // single-token doc: no bigrams, scores the default
    val solo = Seq("solo").toDF("text")
      .select(LmOps.avgBigramProb(col("text"), probs.toSeq.sorted,
        default = -1.0)).collect().head.getDouble(0)
    assert(solo == -1.0)
  }

  test("qualityBucket tiers by fixed cutoffs") {
    import spark.implicits._
    val got = Seq(0.5, 0.01, 0.0001).toDF("s")
      .select(LmOps.qualityBucket(col("s"), 0.1, 0.001)).collect()
      .map(_.getString(0)).toList
    assert(got == List("head", "middle", "tail"))
  }

  // ---- seedAssign / diversitySample ----------------------------------

  test("seedAssign assigns every vector; seeds map to themselves") {
    val assigned = VectorOps.seedAssign(vecs, nSeeds = 4).cache()
    try {
      assert(assigned.count() == vecs.count())
      val seedIds = vecs.orderBy(col("id")).limit(4)
        .collect().map(_.getLong(0)).toSet
      // a seed's nearest seed is itself (cosine with itself is maximal)
      val selfAssigned = assigned.filter(col("id").isin(seedIds.toSeq: _*))
        .collect()
      assert(selfAssigned.forall(r =>
        r.getLong(r.fieldIndex("cluster")) == r.getLong(r.fieldIndex("id"))))
      // every cluster label is a seed id
      val labels = assigned.select("cluster").distinct()
        .collect().map(_.getLong(0)).toSet
      assert(labels.subsetOf(seedIds))
    } finally assigned.unpersist()
  }

  // ---- plan shape (the scale contracts, pinned) ----------------------

  test("round-7 operators plan their scale shapes") {
    // p38: the corpus joins the per-source totals with a BROADCAST hash
    // join (O(sources) build side) — a sort-merge join here would
    // shuffle the whole corpus for a 20-row dimension
    val mix = mixed(budget = 10000L).queryExecution.executedPlan.toString
    assert(mix.contains("BroadcastHashJoin"), mix)
    assert(!mix.contains("SortMergeJoin") && !mix.contains("CartesianProduct"),
      "mixture rates must broadcast, never shuffle the corpus")
    // p39: shard + sort key are per-row arithmetic — NO exchange at all
    val shuf = SampleOps.epochShuffle(
        docs.select(col("doc_id")), "doc_id", epoch = 1, nShards = 8)
      .queryExecution.executedPlan.toString
    assert(!shuf.contains("Exchange"),
      s"epoch shuffle assignment must be shuffle-free:\n$shuf")
    // p41: seed assignment is an expression (no join), the quota runs
    // on TopKPerKey — never a per-cluster window sort
    val div = VectorOps.diversitySample(vecs, nSeeds = 4, quota = 10)
      .queryExecution.executedPlan.toString
    assert(div.contains("TopKPerKeyExec"), div)
    assert(!div.contains("Window"),
      "cluster quota must not fall back to a window sort")
    assert(!div.contains("CartesianProduct") &&
      !div.contains("BroadcastNestedLoopJoin"),
      "seed assignment must ride the plan as an expression, not a join")
  }

  test("diversitySample caps every cluster at the quota, deterministically") {
    val s1 = VectorOps.diversitySample(vecs, nSeeds = 4, quota = 10)
    val counts = s1.groupBy("cluster").count().collect().map(_.getLong(1))
    assert(counts.forall(_ <= 10))
    val a = s1.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = VectorOps.diversitySample(vecs, nSeeds = 4, quota = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    // the sample is the hash-ranked head of each cluster, not the
    // lowest ids: at least one kept row should out-rank a dropped
    // lower id within the same cluster
    val assigned = VectorOps.seedAssign(vecs, nSeeds = 4)
    val dropped = assigned.select(col("id"), col("cluster"))
      .join(s1.select(col("id")), Seq("id"), "left_anti").collect()
    if (dropped.nonEmpty) {
      val keptMaxId = a.map(_._1).max
      assert(dropped.exists(_.getLong(0) < keptMaxId),
        "hash ranking should not reduce to keep-the-lowest-ids")
    }
  }
}
