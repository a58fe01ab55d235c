package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared LSH candidate-pair machinery.
  *
  * Banding emits only (id, bucket-key) rows — payloads (shingle sets,
  * vectors) never ride the banding shuffle. Candidate pairs come from a
  * codegen'd self-equi-join on the bucket key (the "band → bucket-join"
  * shape), then payloads are joined back for verification — the
  * verification side is usually small enough that Catalyst broadcasts
  * it.
  *
  * Skew guard: buckets above `maxBucket` members are dropped before the
  * join (a boilerplate string landing 10⁶ docs in one bucket would
  * otherwise cost 10¹² pairs). At scale, count what was dropped.
  */
private[graft] object LshJoin {

  /** Round-14 (guide §2.2, the p10/p28 find generalized): every
    * banding exchange here carries a few bytes per row (ids + bucket
    * keys) but feeds a COMPUTE-dense stage — C(bucket,2) pair
    * expansion plus the dedup's partial aggregate — so AQE's default
    * 1 MB coalescing floor folds it to one or two tasks (p10's
    * expansion ran 1.7-2.1 s as ONE task inside a 3.2 s gate). The
    * 16 KB floor keeps ~task-per-core on small-byte exchanges and is
    * inert at scale (partition targets are max(total/parallelism,
    * floor)). Same build-time mechanism and value as
    * DedupOps.verifyStageParallelism; swept between queries by
    * SparkEntry.resetSessionConfs. NOT applied to the containment
    * SCREENS (which do not route through LshJoin): their byte-bound
    * probe⋈index stages measured slower when fragmented (round-14
    * inherited A/B: p89 2.60→4.12 s). */
  private def expansionParallelism(df: DataFrame): Unit =
    df.sparkSession.conf.set(
      "spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")

  /** banded: (id, key...) -> distinct candidate (id_a, id_b), id_a<id_b.
    *
    * Single pass over `banded`: one shuffle into (bucket -> id list),
    * then pair expansion over the ID arrays. IDs are the ONLY payload
    * that rides the shuffle or the expansion (a semi-join + self-join
    * formulation re-evaluates the upstream signature pipeline once per
    * join side — measured 2.5x slower end-to-end).
    *
    * @param skewObs optional [[Observation]]: after the query's action
    *   completes, `skewObs.get` reports `dropped_buckets` /
    *   `dropped_ids` / `max_bucket_size` — what the `maxBucket` skew
    *   guard silently discarded. At 100 TB that visibility is the
    *   difference between "dedup ran" and "dedup ran and skipped the
    *   three viral boilerplate buckets"; `observe` rides the existing
    *   aggregation, costing no extra pass. Caveat: if EVERY bucket is
    *   dropped, AQE's empty-relation propagation may prune the observed
    *   node with the rest of the subtree and report no metrics. */
  def candidates(banded: DataFrame, keyCols: Seq[String], maxBucket: Int,
      skewObs: Option[org.apache.spark.sql.Observation] = None): DataFrame =
    // native pair expansion inside candidatesRaw: the HOF spelling
    // (flatten/transform/filter/slice) evaluates interpreted lambdas
    // per ELEMENT — n²/2 per bucket
    candidatesRaw(banded, keyCols, maxBucket, skewObs)
      .dropDuplicates("id_a", "id_b")

  /** [[candidates]] WITHOUT the final distinct: candidate pair
    * OCCURRENCES, possibly repeated across bucket keys. For verifiers
    * whose per-occurrence cost is a cheap codegen'd expression (a dot
    * product) and whose candidate stream is dominated by
    * collide-in-one-table-only false positives, verify-then-dedupe
    * beats paying a candidate-sized exchange up front — the caller
    * owns the final `dropDuplicates` AFTER its verification filter.
    * Callers whose verification payload is heavy (shingle arrays) or
    * whose candidates repeat across many keys should keep
    * [[candidates]]. */
  def candidatesRaw(banded: DataFrame, keyCols: Seq[String], maxBucket: Int,
      skewObs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    expansionParallelism(banded)
    val sized = banded.groupBy(keyCols.map(col): _*)
      .agg(collect_list(col("id")).as("ids"))
    val watched = skewObs.fold(sized)(o => sized.observe(o,
      sum(when(size(col("ids")) > maxBucket, 1L).otherwise(0L))
        .as("dropped_buckets"),
      sum(when(size(col("ids")) > maxBucket, size(col("ids"))).otherwise(0L))
        .as("dropped_ids"),
      max(size(col("ids"))).as("max_bucket_size")))
    watched.filter(size(col("ids")).between(2, maxBucket))
      .select(explode(graft.functions.native.sorted_pairs(col("ids"))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
  }

  /** [[candidatesRaw]] with the PPJoin LENGTH filter fused into the
    * pair expansion (round-14): `banded` ids must be the packed
    * (id·2²⁴ + sz·2¹² + pos) longs; only pairs with
    * min(sz) ≥ max(sz)·tau − 1e-6 are materialized — the exact
    * survivor set of candidatesRaw + the caller's post-filter, at
    * cost proportional to survivors instead of C(bucket,2), with the
    * cross-size pairs never reaching the candidate exchange. */
  def candidatesRawSim(banded: DataFrame, keyCols: Seq[String],
      maxBucket: Int, tau: Double,
      skewObs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    expansionParallelism(banded)
    val sized = banded.groupBy(keyCols.map(col): _*)
      .agg(collect_list(col("id")).as("ids"))
    val watched = skewObs.fold(sized)(o => sized.observe(o,
      sum(when(size(col("ids")) > maxBucket, 1L).otherwise(0L))
        .as("dropped_buckets"),
      sum(when(size(col("ids")) > maxBucket, size(col("ids"))).otherwise(0L))
        .as("dropped_ids"),
      max(size(col("ids"))).as("max_bucket_size")))
    watched.filter(size(col("ids")).between(2, maxBucket))
      .select(explode(
        graft.functions.native.sorted_pairs_sim(col("ids"), tau)).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
  }

  /** [[candidates]] with a RELATIVE skew guard (round-9, VERDICT r8
    * item 1): instead of one absolute `maxBucket` that is generous at
    * sf0.01 and quadratic at sf1, the per-bucket cap is derived from a
    * total CANDIDATE budget. A bucket of size b emits ~b²/2 pairs; with
    * per-bucket cap c over n banded rows the worst case is (n/c)
    * buckets × c²/2 = n·c/2 candidates, so c = 2·budget/n bounds the
    * expansion at `candidateBudget` pairs REGARDLESS of corpus size —
    * the guard tightens as the data grows instead of silently letting
    * in-bucket expansion go quadratic (m14's round-8 failure: 51× cost
    * for 10× data with every bucket under the absolute cap).
    *
    * The row total rides the plan as a 1-row broadcast (count → cross
    * join), so no driver action and no second job; `maxBucket` remains
    * the absolute ceiling and 64 the floor (tiny fixtures must not
    * drop recall the oracle asserts on). skewObs additionally reports
    * the EFFECTIVE cap (`bucket_cap`) next to what it dropped. */
  def candidatesBudgeted(banded: DataFrame, keyCols: Seq[String],
      maxBucket: Int, candidateBudget: Long,
      skewObs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    expansionParallelism(banded)
    val sized = banded.groupBy(keyCols.map(col): _*)
      .agg(collect_list(col("id")).as("ids"))
    val tot = banded.agg(count(lit(1)).as("n_banded"))
    val withCap = sized.crossJoin(broadcast(tot))
      .withColumn("cap", least(lit(maxBucket.toLong),
        greatest(lit(64L),
          lit(2L * candidateBudget) / greatest(col("n_banded"), lit(1L)))))
    val watched = skewObs.fold(withCap)(o => withCap.observe(o,
      sum(when(size(col("ids")) > col("cap"), 1L).otherwise(0L))
        .as("dropped_buckets"),
      sum(when(size(col("ids")) > col("cap"), size(col("ids"))).otherwise(0L))
        .as("dropped_ids"),
      max(size(col("ids"))).as("max_bucket_size"),
      max(col("cap")).as("bucket_cap")))
    watched.filter(size(col("ids")).between(2, col("cap")))
      .select(explode(graft.functions.native.sorted_pairs(col("ids"))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Banded Δ-side vs banded index-side → distinct (id_new, id_idx)
    * candidates: the INCREMENTAL screen shape (a new batch against an
    * existing corpus index — never index×index). One shuffle sizes the
    * index buckets (at scale the banded index is a materialized table,
    * so that cost is paid at index-build time, not per increment); the
    * increment then equi-joins by bucket key, so candidate volume is
    * ∝ |Δ|·bucket. The skew guard applies to the index side — the side
    * whose buckets grow with the historical corpus.
    *
    * @param skewObs same metrics contract as [[candidates]]
    *   (dropped_buckets / dropped_ids / max_bucket_size, here over the
    *   INDEX side's buckets). The incremental screen is the production
    *   path at 100 TB, so its recall loss on hot buckets must be as
    *   visible as the batch path's — a silently dropped viral-
    *   boilerplate bucket means every future increment re-admits
    *   near-dups of it. */
  def candidatesAcross(bandedNew: DataFrame, bandedIndex: DataFrame,
      keyCols: Seq[String], maxBucket: Int,
      skewObs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    expansionParallelism(bandedNew)
    val allSized = bandedIndex.groupBy(keyCols.map(col): _*)
      .agg(collect_list(col("id")).as("idx_ids"))
    val watched = skewObs.fold(allSized)(o => allSized.observe(o,
      sum(when(size(col("idx_ids")) > maxBucket, 1L).otherwise(0L))
        .as("dropped_buckets"),
      sum(when(size(col("idx_ids")) > maxBucket, size(col("idx_ids")))
        .otherwise(0L)).as("dropped_ids"),
      max(size(col("idx_ids"))).as("max_bucket_size")))
    val sized = watched.filter(size(col("idx_ids")).between(1, maxBucket))
    bandedNew.join(sized, keyCols)
      .select(col("id").as("id_new"), explode(col("idx_ids")).as("id_idx"))
      .dropDuplicates("id_new", "id_idx")
  }

  /** Join a per-id payload column back onto the candidate pairs. */
  def attach(cands: DataFrame, payload: DataFrame, valueCol: String): DataFrame = {
    val a = payload.toDF("id_a", s"${valueCol}_a")
    val b = payload.toDF("id_b", s"${valueCol}_b")
    cands.join(a, "id_a").join(b, "id_b")
  }
}
