package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{IvfIndex, SparkTestSession, Tables}

/** Build/probe split fidelity + plan shape for the prebuilt IVF-PQ
  * index (round-6 verdict task: the index is built once and probed
  * daily; probing must not retrain, re-quantize, or shuffle the
  * corpus). */
class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def corpus = Tables.table(spark, sf, "embeddings")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  private def results(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("probe against a saved+reloaded index equals probe against the built index") {
    val built = VectorOps.buildIvfPqIndex(corpus, nlist = 8)
    val path = s"/tmp/graft_ivf_spec_${System.nanoTime()}"
    VectorOps.saveIvfPqIndex(built, path)
    val loaded = VectorOps.loadIvfPqIndex(spark, path)
    // the centroid model round-trips bit-identically (doubles in parquet)
    assert(loaded.centroids == built.centroids)
    val q = corpus.filter(col("id") < 5)
    def probe(ix: VectorOps.IvfPqIndex) = results(
      VectorOps.ivfPqProbe(q, ix, k = 4, nprobe = 3, rescoreK = 3,
        rescoreCorpus = Some(corpus)))
    assert(probe(loaded) == probe(built))
  }

  test("probe-only against the prebuilt index equals the self-contained build+probe") {
    val idx = IvfIndex.ensureFull(spark, sf)
    val q = corpus.filter(col("id") < 5)
    val probed = results(VectorOps.ivfPqProbe(q, idx, k = 4, nprobe = 3,
      rescoreK = 3, rescoreCorpus = Some(corpus)))
    val selfContained = results(VectorOps.ivfPqTopK(q, corpus, k = 4,
      nlist = IvfIndex.NList, nprobe = 3, rescoreK = 3))
    assert(probed == selfContained)
  }

  test("probe plan: broadcast joins only; no exchange ever hashes the corpus side") {
    val idx = IvfIndex.ensureFull(spark, sf)
    val q = corpus.filter(col("id") < 5)
    val plan = VectorOps.ivfPqProbe(q, idx, k = 4, nprobe = 3,
        rescoreK = 3, rescoreCorpus = Some(corpus))
      .queryExecution.executedPlan.toString
    // probe join (lists x broadcast probes) and rescore join
    // (corpus x broadcast candidate band) must both be broadcast —
    // a sort-merge join here means the inverted lists / float corpus
    // shuffled, which is exactly what the probe path must never do
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // the only hash exchanges are the per-query rankings (query_id);
    // cid / neighbor_id exchanges would mean corpus-sized shuffles
    val exchanges = "Exchange hashpartitioning\\(([a-zA-Z_0-9#]+)"
      .r.findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(exchanges.forall(_.startsWith("query_id")),
      s"corpus-sized exchange in probe plan: $exchanges\n$plan")
  }
}
