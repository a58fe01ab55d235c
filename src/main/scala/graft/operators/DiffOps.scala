package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing — the dataset-versioning primitive of a
  * curation pipeline: given two snapshots of the same corpus, classify
  * every document as added / removed / changed / unchanged by content
  * fingerprint. The publish step of every re-crawl ("what did this
  * release change?") and the audit input for incremental reprocessing
  * (only `added` + `changed` docs re-enter the pipeline).
  *
  * Scale shape: fingerprints are per-row (shuffle-free); the diff
  * itself is ONE full-outer equi-join on the document id — the
  * inherent cost of a complete diff. At 100 TB both snapshots would be
  * bucketed by id at write time (see [[graft.BucketedTables]]): then
  * the join needs no exchange at all and the diff is embarrassingly
  * parallel per bucket. Only (id, 32-byte fingerprint) pairs ride the
  * join — never document bodies.
  */
object DiffOps {

  /** Per-document diff of two snapshots: `(id, fp_old, fp_new,
    * change)` with change ∈ added | removed | changed | unchanged.
    * Fingerprints are the same normalized-content md5 the exact-dedup
    * operators use ([[TextOps.fingerprint]]), so "changed" means the
    * content changed beyond whitespace/case — a re-crawl that only
    * re-flowed whitespace is `unchanged`, exactly like it is for dedup. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val o = oldSnap.select(col(idCol).as("id"),
      TextOps.fingerprint(col(textCol)).as("fp_old"))
    val n = newSnap.select(col(idCol).as("id"),
      TextOps.fingerprint(col(textCol)).as("fp_new"))
    o.join(n, Seq("id"), "full_outer")
      .withColumn("change",
        when(col("fp_old").isNull, lit("added"))
          .when(col("fp_new").isNull, lit("removed"))
          .when(col("fp_old") =!= col("fp_new"), lit("changed"))
          .otherwise(lit("unchanged")))
  }

  /** The release-notes roll-up: per-class document counts. Tiny
    * aggregate state (4 rows) whatever the corpus size. */
  def snapshotDiffSummary(oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String, textCol: String): DataFrame =
    snapshotDiff(oldSnap, newSnap, idCol, textCol)
      .groupBy(col("change")).agg(count(lit(1)).as("n_docs"))
}
