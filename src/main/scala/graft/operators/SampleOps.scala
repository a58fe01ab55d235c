package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` / `rand()` are the WRONG tools at 100 TB: resampling
  * on task retry breaks exactly-once semantics (a retried partition
  * draws different rows), results aren't reproducible across runs, and
  * train/test membership can't be recomputed later from the id alone.
  * The production idiom is HASH-threshold sampling: a deterministic
  * uniform hash of the stable id, kept iff below `fraction`·modulus.
  * Same row set on every run, every retry, every engine — and any
  * later job can recompute membership without storing it.
  *
  * The hash is Knuth multiplicative hashing in exact 64-bit integer
  * arithmetic, `((id mod P) · (A mod P) + salt) mod P` with
  * P = 1000000007, A = 2654435761: every intermediate stays below
  * 2^60 (no overflow under ANSI mode, no BigInt), and the identical
  * expression evaluates bit-equal in any ANSI SQL engine — which is
  * what makes these operators exactly oracle-able.
  *
  * Scale notes: per-row arithmetic on a numeric column — zero shuffle,
  * fully codegen'd, pushdown-friendly (the filter reaches the parquet
  * scan). Stratified sampling adds one CASE over the stratum column;
  * still zero shuffle.
  */
object SampleOps {

  val P: Long = 1000000007L
  private val AmodP: Long = 2654435761L % P // 654435747

  /** Deterministic uniform bucket in [0, P) from a stable numeric id.
    * Change `salt` to draw an independent sample: the salt shifts the
    * id BEFORE the multiplicative mix, so two salts disagree on
    * ~2·f·(1−f) of rows — an additive post-mix salt would only move
    * the threshold boundary and produce nearly the same sample. */
  def hashBucket(id: Column, salt: Long = 0L): Column =
    pmod((pmod(id.cast("long"), lit(P)) + lit(salt % P)) * lit(AmodP), lit(P))

  /** The same bucket arithmetic as ANSI SQL over a column expression —
    * for oracle construction; kept adjacent to [[hashBucket]] so the
    * two can never drift silently. */
  def hashBucketSql(idExpr: String, salt: Long = 0L): String =
    s"((($idExpr % $P) + ${salt % P}) * $AmodP) % $P"

  /** Integer threshold for `fraction` — computed once, driver-side, so
    * Spark and the oracle compare against the same literal. */
  def threshold(fraction: Double): Long = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction outside [0,1]")
    (fraction * P).toLong
  }

  /** Uniform deterministic sample: keeps ~`fraction` of rows. */
  def uniformSample(
      df: DataFrame, idCol: String, fraction: Double, salt: Long = 0L): DataFrame =
    df.filter(hashBucket(col(idCol), salt) < lit(threshold(fraction)))

  /** Stratified deterministic sample: per-stratum fractions (e.g.
    * downsample boilerplate-heavy languages, keep all of a rare one).
    * Rows whose stratum is absent from `rates` use `defaultRate`. */
  def stratifiedSample(
      df: DataFrame, idCol: String, stratum: Column,
      rates: Map[String, Double], defaultRate: Double = 1.0,
      salt: Long = 0L): DataFrame = {
    val thr = rates.foldLeft(lit(threshold(defaultRate))) {
      case (acc, (s, f)) => when(stratum === lit(s), lit(threshold(f))).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), salt) < thr)
  }

  /** Per-key quota balancing (domain/source balancing): keep at most
    * `quota` rows per key, selecting the deterministic hash-ranked head
    * so reruns and task retries keep identical rows and the cap carries
    * no bias toward low ids (ranking by raw id would always keep the
    * oldest documents of every over-represented domain). Runs on the
    * TopKPerKey physical operator: per-partition bounded heaps, then
    * one shuffle on the key — never a full per-key window sort. At
    * 100 TB the partial stage collapses skew before the shuffle: each
    * task emits ≤ quota rows per key it sees, so a hot domain ships
    * O(tasks·quota) rows, not its full row count. */
  def quotaPerKey(df: DataFrame, key: Column, idCol: String, quota: Int,
      salt: Long = 0L): DataFrame =
    graft.plans.TopK.perKey(df,
      keys = Seq(key),
      order = Seq(hashBucket(col(idCol), salt).asc, col(idCol).asc),
      k = quota)

  /** Deterministic train/validation/test split: a labeled column, not a
    * filter — every row keeps exactly one split on every run/retry.
    * Fractions must sum to ≤ 1; the remainder is "train". */
  def split(
      id: Column, valFraction: Double, testFraction: Double,
      salt: Long = 0L): Column = {
    require(valFraction + testFraction <= 1.0, "val+test fractions exceed 1")
    val b = hashBucket(id, salt)
    when(b < lit(threshold(testFraction)), lit("test"))
      .when(b < lit(threshold(testFraction + valFraction)), lit("val"))
      .otherwise(lit("train"))
  }
}
