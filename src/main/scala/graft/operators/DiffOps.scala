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

  /** DISTRIBUTION DRIFT between two snapshots of a score column — the
    * monitoring primitive a daily pipeline runs on its quality/langid/
    * length distributions before trusting a new crawl (the PSI
    * use-case). The divergence is the symmetric chi-square
    * Σ (pA−pB)²/(pA+pB) rather than PSI's Σ (pA−pB)·ln(pA/pB): the
    * same monotone drift signal (both vanish iff the histograms agree,
    * both grow with separation) with PURE rational arithmetic — no
    * libm `ln`, whose final-ulp disagreement across engines would
    * break bit-exact replay (the p22/p51 ratio-form standing). Bins
    * are fixed-width (floor of an engine-identical double — the p64
    * discipline) so each snapshot histogram is ONE map-side-combined
    * groupBy; a quantile binning would need a global rank.
    *
    * Inputs: each side is a DataFrame with a double `score` column.
    * The score domain is [0, 1]: NULL scores are DROPPED before
    * binning (a null bin on each side of the full_outer equi-join
    * could never merge — two disjoint null-bin rows whose contrib
    * double-counts), and out-of-range scores clamp into the edge bins
    * (bin = clamp(floor(score·n), 0, n−1), which also folds the
    * boundary score 1.0 into the top bin instead of minting bin n).
    * Returns per-bin (bin, n_a, n_b, p_a, p_b, contrib); the total
    * drift is `sum(contrib)`, left to the caller so the per-bin
    * evidence (WHICH score region moved) stays in the result. Scale:
    * two histogram groupBys + a \|bins\|-row join + one broadcast of
    * the two totals — aggregate-state-only shuffles at any corpus
    * size. */
  def distributionDrift(a: DataFrame, b: DataFrame,
      nBins: Int): DataFrame = {
    require(nBins >= 1, "nBins >= 1")
    def binned(df: DataFrame, n: String) = df
      .filter(col("score").isNotNull)
      .select(least(greatest(floor(col("score") * nBins), lit(0L)),
        lit(nBins - 1L)).cast("int").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(n))
    val j = binned(a, "n_a").join(binned(b, "n_b"), Seq("bin"), "full_outer")
      .select(col("bin"), coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val tot = j.agg(sum(col("n_a")).as("t_a"), sum(col("n_b")).as("t_b"))
    j.crossJoin(broadcast(tot))
      .withColumn("p_a", col("n_a").cast("double") / col("t_a"))
      .withColumn("p_b", col("n_b").cast("double") / col("t_b"))
      .withColumn("contrib",
        when(col("p_a") + col("p_b") > 0,
          (col("p_a") - col("p_b")) * (col("p_a") - col("p_b"))
            / (col("p_a") + col("p_b")))
          .otherwise(lit(0.0)))
      .select(col("bin"), col("n_a"), col("n_b"), col("p_a"), col("p_b"),
        col("contrib"))
  }
}
