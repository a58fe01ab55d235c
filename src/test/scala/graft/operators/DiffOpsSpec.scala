package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Snapshot diff: per-document added/removed/changed/unchanged
  * classification between two corpus releases, by the same normalized
  * fingerprint exact dedup uses. */
class DiffOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("classifies added, removed, changed, unchanged") {
    val oldSnap = Seq((1L, "alpha text"), (2L, "beta text"),
      (3L, "gamma text")).toDF("doc_id", "text")
    val newSnap = Seq((2L, "beta text"), (3L, "gamma text edited"),
      (4L, "delta text")).toDF("doc_id", "text")
    val out = DiffOps.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
      .select(col("id"), col("change")).as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("whitespace/case re-flow is unchanged (dedup-grade normalization)") {
    val oldSnap = Seq((1L, "Alpha   Text")).toDF("doc_id", "text")
    val newSnap = Seq((1L, "alpha text")).toDF("doc_id", "text")
    val out = DiffOps.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
      .select(col("change")).as[String].collect()
    assert(out.toSeq == Seq("unchanged"))
  }

  test("split leakage reports every cross-split fingerprint collision") {
    val df = Seq(
      (1L, "shared doc", "train"),
      (2L, "shared doc", "test"),   // leaks: trains on test content
      (3L, "Shared   DOC", "val"),  // leaks via normalization
      (4L, "clean doc", "test"),    // no train twin — clean
      (5L, "train only", "train"),
      (6L, "shared doc", "train")   // second train copy → second pair
    ).toDF("doc_id", "text", "split")
    val got = DedupOps.splitLeakage(df, "doc_id", "text", "split")
      .select(col("id_eval"), col("id_train")).as[(Long, Long)]
      .collect().toSet
    assert(got == Set((2L, 1L), (2L, 6L), (3L, 1L), (3L, 6L)))
  }

  test("diff and leakage join on fingerprints only — no nested-loop join") {
    val df = (1 to 200).map(i => (i.toLong, s"doc body number $i"))
      .toDF("doc_id", "text")
    val diffPlan = DiffOps.snapshotDiff(df, df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!diffPlan.contains("BroadcastNestedLoopJoin") &&
      !diffPlan.contains("CartesianProduct"), diffPlan)
    val leakPlan = DedupOps.splitLeakage(
        df.withColumn("split", SampleOps.split(col("doc_id"), 0.2, 0.1)),
        "doc_id", "text", "split")
      .queryExecution.executedPlan.toString
    assert(!leakPlan.contains("BroadcastNestedLoopJoin") &&
      !leakPlan.contains("CartesianProduct"), leakPlan)
  }

  test("summary counts every class") {
    val oldSnap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val newSnap = Seq((2L, "b"), (3L, "c2"), (4L, "d"), (5L, "e"))
      .toDF("doc_id", "text")
    val m = DiffOps.snapshotDiffSummary(oldSnap, newSnap, "doc_id", "text")
      .as[(String, Long)].collect().toMap
    assert(m == Map("added" -> 2L, "removed" -> 1L,
      "changed" -> 1L, "unchanged" -> 1L))
  }
}
