package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class ClusterSampleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- connected components ---------------------------------------------

  test("connected components: chains, cliques, and separate islands") {
    // components: {1,2,3,4} (a chain), {10,11,12} (a triangle), {20,21}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (21L, 20L)).toDF("a", "b")
    val got = ClusterOps.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connected components: long path needs multiple rounds, converges") {
    // path 0-1-2-...-19: diameter 19, min label must walk the whole way
    val edges = (0L until 19L).map(i => (i, i + 1)).toDF("a", "b")
    val got = ClusterOps.connectedComponents(edges, "a", "b", maxIter = 25)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 20 && got.values.forall(_ == 0L))
  }

  test("connected components: iteration cap throws rather than mislabels") {
    val edges = (0L until 19L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      ClusterOps.connectedComponents(edges, "a", "b", maxIter = 3)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("dedupClusters: singletons kept, one keeper per cluster") {
    val docs = (0L until 10L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 5L), (7L, 8L)).toDF("id_a", "id_b")
    val got = ClusterOps.dedupClusters(docs, "doc_id", pairs, "id_a", "id_b")
      .select("doc_id", "comp", "cluster_size", "keep")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L) == ((1L, 1L, 3L, true)))
    assert(byId(2L) == ((2L, 1L, 3L, false)))
    assert(byId(5L) == ((5L, 1L, 3L, false)))
    assert(byId(7L) == ((7L, 7L, 2L, true)))
    assert(byId(8L) == ((8L, 7L, 2L, false)))
    // singletons are their own kept cluster
    assert(Seq(0L, 3L, 4L, 6L, 9L).forall(i => byId(i) == ((i, i, 1L, true))))
    // exactly one keeper per component
    assert(got.filter(_._4).map(_._2).distinct.length ==
      got.map(_._2).distinct.length)
  }

  // ---- deterministic sampling ---------------------------------------------

  test("hash sampling is deterministic and near the target fraction") {
    val ids = spark.range(100000).toDF("id")
    def draw(salt: Long): Set[Long] =
      SampleOps.uniformSample(ids, "id", 0.25, salt).as[Long].collect().toSet
    val a = draw(9)
    assert(a == draw(9), "same salt must draw the same row set")
    assert(math.abs(a.size - 25000.0) / 25000.0 < 0.02, s"got ${a.size} of ~25000")
    // independent draws overlap on ~f² of rows, not ~f
    val c = draw(10)
    val overlap = (a & c).size.toDouble / 25000.0
    assert(overlap < 0.35, s"salts 9 and 10 overlap on ${overlap * 100}% of rows " +
      "(expected ~25% for independent draws)")
  }

  test("stratified sampling applies per-stratum rates") {
    val df = spark.range(40000)
      .select(col("id"), when(col("id") % 2 === 0, "a").otherwise("b").as("s"))
    val got = SampleOps.stratifiedSample(df, "id", col("s"),
      Map("a" -> 0.1), defaultRate = 0.9, salt = 3)
    val byS = got.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(math.abs(byS("a") - 2000.0) / 2000.0 < 0.1, s"stratum a: ${byS("a")}")
    assert(math.abs(byS("b") - 18000.0) / 18000.0 < 0.05, s"stratum b: ${byS("b")}")
  }

  test("split labels are exhaustive, disjoint, and near the fractions") {
    val df = spark.range(50000)
      .select(col("id"), SampleOps.split(col("id"), 0.1, 0.2, salt = 5).as("sp"))
    val byS = df.groupBy("sp").count().as[(String, Long)].collect().toMap
    assert(byS.keySet == Set("train", "val", "test"))
    assert(byS.values.sum == 50000)
    assert(math.abs(byS("test") - 10000.0) / 10000.0 < 0.05)
    assert(math.abs(byS("val") - 5000.0) / 5000.0 < 0.07)
  }

  test("quotaPerKey caps every key deterministically, no low-id bias") {
    val df = spark.range(10000)
      .select(col("id"), (col("id") % 7).cast("string").as("k"))
    def draw(): Seq[(Long, String)] =
      SampleOps.quotaPerKey(df, col("k"), "id", quota = 25, salt = 13)
        .select("id", "k").as[(Long, String)].collect().toSeq.sorted
    val a = draw()
    assert(a == draw(), "quota selection must be retry/rerun-stable")
    val perKey = a.groupBy(_._2).view.mapValues(_.size)
    assert(perKey.values.forall(_ == 25), s"every key capped at 25: $perKey")
    // hash-ranked, not id-ranked: the kept head must not be ids 0..174
    assert(a.map(_._1).max > 1000, "kept rows should spread over the id range")
    // a key smaller than the quota is kept whole
    val tiny = df.filter(col("id") < 10)
    assert(SampleOps.quotaPerKey(tiny, col("k"), "id", 25, 13).count() == 10)
  }

  test("the SQL bucket rendering matches the Column bucket exactly") {
    // hashBucketSql is what oracle queries embed — it must never drift
    // from hashBucket
    val df = spark.range(1000).toDF("id")
    val viaCol = df.select(col("id"), SampleOps.hashBucket(col("id"), 42).as("b"))
    val viaSql = df.selectExpr("id", SampleOps.hashBucketSql("id", 42) + " AS b")
    assert(viaCol.exceptAll(viaSql).isEmpty && viaSql.exceptAll(viaCol).isEmpty)
  }
}
