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
  /** Knuth multiplier reduced mod P — public because the connector's
    * TABLESAMPLE pushdown renders the SAME bucket arithmetic as remote
    * SQL (sampling semantics must not drift between the in-engine and
    * pushed-down forms). */
  val AmodP: Long = 2654435761L % P // 654435747

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

  /** Keep the top `fraction` of rows PER KEY by a bounded score in
    * [0, 1] — quality-threshold selection ("keep the best 20% of every
    * source"), the filtering stage after quality scoring.
    *
    * Sorting per key is the naive shape (a full corpus shuffle + skew
    * on hot keys); exact per-key quantiles cost per-group value state.
    * This uses the scalable idiom instead: quantize the score into
    * `buckets` fixed bins, build the per-(key, bucket) HISTOGRAM
    * (bounded state: keys × buckets rows, whatever the corpus size),
    * walk its CDF from the top to find each key's threshold bucket,
    * and admit rows by `bucket >= threshold` — a per-row filter under
    * a broadcast of the tiny threshold table. The corpus is touched
    * twice (histogram pass + filter pass) but never shuffled.
    *
    * Semantics are bucket-granular and DETERMINISTIC: at least
    * ceil(fraction·n_key) rows are kept per key, and dropping the
    * lowest admitted bucket would undershoot the target — ties within
    * the threshold bucket are all kept (threshold selection, not exact
    * count). Both engines reproduce the exact same row set because the
    * whole construction is integer arithmetic over IEEE-quantized
    * scores. */
  def topFractionByScore(df: DataFrame, keyCol: String, scoreCol: String,
      fraction: Double, buckets: Int = 1000): DataFrame = {
    require(fraction > 0 && fraction <= 1, s"fraction $fraction outside (0,1]")
    require(buckets > 0, s"buckets must be positive: $buckets")
    val bkt = least(floor(col(scoreCol) * buckets), lit(buckets - 1))
      .cast("int")
    val binned = df.withColumn("__bkt", bkt)
    val hist = binned.groupBy(col(keyCol), col("__bkt"))
      .agg(count(lit(1)).as("__n"))
    val byKeyDesc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("__bkt").desc)
    val cum = hist.withColumn("__cum", sum(col("__n")).over(byKeyDesc))
    val tot = hist.groupBy(col(keyCol)).agg(sum(col("__n")).as("__tot"))
    val thr = cum.join(tot, keyCol)
      .filter(col("__cum") >=
        ceil(lit(fraction) * col("__tot").cast("double")))
      .groupBy(col(keyCol)).agg(max(col("__bkt")).as("__thr"))
    binned.join(broadcast(thr), keyCol)
      .filter(col("__bkt") >= col("__thr"))
      .drop("__bkt", "__thr")
  }

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

  /** Mixture sampling to a TOKEN budget (the DoReMi/Pile "data mixing"
    * stage): each source s gets `weights(s)` of `budgetTokens` total
    * tokens, applied as a deterministic hash-threshold downsample at
    * rate min(1, weight·budget / tokens_s). Sources absent from
    * `weights` use `defaultWeight`.
    *
    * The per-source rates are DATA-DRIVEN (they depend on each source's
    * token total), so unlike [[stratifiedSample]] the thresholds cannot
    * be driver-side literals; they are computed IN the plan — one tiny
    * groupBy over (source, Σ tokens) that AQE turns into a broadcast
    * join back onto the corpus — and the corpus itself is touched once,
    * per-row, shuffle-free. The rate arithmetic is pure IEEE-double
    * (long-exact token sums, one multiply/divide, `least`, `floor`), so
    * any ANSI engine reproduces the selected row set bit-for-bit.
    *
    * Scale shape at 100 TB: the totals aggregate is O(sources) rows
    * (map-side partial combine does the heavy lifting); the broadcast
    * is O(sources); the filter is per-row integer arithmetic that
    * whole-stage codegen inlines. No corpus shuffle anywhere. */
  def mixtureSample(
      df: DataFrame, idCol: String, sourceCol: String, tokenCount: Column,
      weights: Map[String, Double], budgetTokens: Long,
      defaultWeight: Double = 0.0, salt: Long = 0L): DataFrame = {
    val w = weights.foldLeft(lit(defaultWeight)) { case (acc, (s, f)) =>
      when(col(sourceCol) === lit(s), lit(f)).otherwise(acc)
    }
    val totals = df.groupBy(col(sourceCol))
      .agg(sum(tokenCount.cast("long")).as("tok_s"))
      .select(col(sourceCol).as("__mix_source"),
        least(lit(1.0), w * lit(budgetTokens.toDouble) /
          col("tok_s").cast("double")).as("rate"))
    df.join(broadcast(totals), col(sourceCol) === col("__mix_source"))
      .filter(hashBucket(col(idCol), salt) <
        floor(col("rate") * lit(P.toDouble)).cast("long"))
      .drop("__mix_source")
  }

  /** Mixture allocation WITH UPSAMPLING (the full data-mixing
    * semantics): where [[mixtureSample]] caps each source's rate at 1,
    * real mixes UPSAMPLE scarce high-value sources — a rate of 2.3
    * means every doc rides 2 full epochs and a deterministic 30%
    * subset rides a third. Returns each kept doc with `n_copies`
    * (≥ 1; docs outside the fractional remainder of a rate < 1 source
    * are dropped). The writer materializes `n_copies` via
    * `explode(sequence(1, n_copies))` or, better, the training reader
    * consumes the count directly — either way Σ n_copies·tokens ≈
    * weight·budget per source, which is the contract.
    *
    * Same plan shape as [[mixtureSample]]: O(sources) aggregate,
    * broadcast back, per-row integer arithmetic, zero corpus shuffle;
    * same IEEE-exact rate arithmetic so the row set and every copy
    * count reproduce bit-for-bit in any ANSI engine. */
  def mixtureEpochs(
      df: DataFrame, idCol: String, sourceCol: String, tokenCount: Column,
      weights: Map[String, Double], budgetTokens: Long,
      defaultWeight: Double = 0.0, salt: Long = 0L): DataFrame = {
    val w = weights.foldLeft(lit(defaultWeight)) { case (acc, (s, f)) =>
      when(col(sourceCol) === lit(s), lit(f)).otherwise(acc)
    }
    val totals = df.groupBy(col(sourceCol))
      .agg(sum(tokenCount.cast("long")).as("tok_s"))
      .select(col(sourceCol).as("__mix_source"),
        (w * lit(budgetTokens.toDouble) / col("tok_s").cast("double"))
          .as("rate"))
    df.join(broadcast(totals), col(sourceCol) === col("__mix_source"))
      .withColumn("n_copies",
        floor(col("rate")).cast("long") +
          when(hashBucket(col(idCol), salt) <
            floor((col("rate") - floor(col("rate"))) * lit(P.toDouble))
              .cast("long"), 1L).otherwise(0L))
      .filter(col("n_copies") > 0)
      .drop("__mix_source")
  }

  /** Deterministic epoch shuffle + sharding for training-data writes:
    * every row gets a shard in [0, nShards) and an independent
    * within-shard sort key, both pure functions of (id, epoch). A new
    * epoch draws a fresh permutation; a task retry or a re-run draws
    * the identical one — which `orderBy(rand())`, the naive epoch
    * shuffle, guarantees neither of.
    *
    * This op deliberately emits the shard and SORT KEY rather than a
    * materialized global position: the writer runs
    * `partitionBy(shard) + sortWithinPartitions(sort_key)` and gets the
    * shuffled epoch with exactly one exchange, sized by nShards. A
    * global row_number per shard would either funnel each shard through
    * one task (the window-sort trap TopKPerKey exists to avoid) or need
    * the two-phase prefix sum PackingOps uses — and training readers
    * consume shard files in order, so positions are never needed. */
  def epochShuffle(
      df: DataFrame, idCol: String, epoch: Int, nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    df.withColumn("shard",
        pmod(hashBucket(col(idCol), 1000003L * (epoch + 1)), lit(nShards.toLong))
          .cast("int"))
      .withColumn("sort_key", hashBucket(col(idCol), 7000003L * (epoch + 1)))
  }

  /** Token-budget corpus selection: take documents in (quality DESC,
    * id ASC) order until the cumulative token count exceeds
    * `budgetTokens` — the "best N tokens" cut every pretraining-data
    * curation run ends with ("train on the top 1T tokens by quality").
    * Returns the selected rows with their token count and exclusive
    * global token offset.
    *
    * The naive spelling is `sum(weight) OVER (ORDER BY quality DESC)`
    * — a single-partition window that funnels the corpus through one
    * task. This is the two-phase distributed scan of
    * [[PackingOps.packChunks]] re-keyed from an id RANGE to a QUALITY
    * range: rows bucket by a deterministic quality stride (every row
    * with the same quality lands in the same bucket, so bucket order
    * IS selection order), per-bucket token totals cumulate on the
    * driver (O(buckets), never O(rows)), and buckets whose base offset
    * already exceeds the budget are PRUNED before the heavy local-scan
    * pass — at 100 TB with a 1% budget, ~99% of the corpus never
    * shuffles. Skew note: quality scores concentrated on few distinct
    * values collapse buckets; the stride bucketing stays correct (just
    * unbalanced), and the in-budget data per bucket is re-spread by
    * the repartition before the local scan.
    *
    * Semantics: the ordered stream is truncated at the first document
    * that would overflow the budget — `start_tok + n_tok ≤ budget`,
    * exactly `sum(w) OVER (ORDER BY q DESC, id) ≤ budget` in SQL.
    * Rows with a null quality or null weight are EXCLUDED up front: a
    * null has no position in a quality ordering and no token count,
    * and engines disagree on where DESC places nulls — admitting them
    * would make the cut engine-dependent (and NPE the driver-side
    * bucket fold, which decodes pid/n_tok as primitives). */
  def tokenBudgetSelect(df: DataFrame, idCol: String, quality: Column,
      weight: Column, budgetTokens: Long, parts: Int = 0): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val nParts = if (parts > 0) parts
      else spark.sessionState.conf.numShufflePartitions
    val base = df.select(col(idCol).cast("long").as("id"),
        quality.cast("double").as("quality"), weight.cast("long").as("n_tok"))
      .filter(col("quality").isNotNull && col("n_tok").isNotNull)
    val b = base.agg(min("quality"), max("quality")).collect().head
    if (b.isNullAt(0)) {
      return base.select(col("id"), col("quality"), col("n_tok"),
        col("n_tok").as("start_tok")).limit(0)
    }
    val lo = b.getDouble(0)
    val hi = b.getDouble(1)
    // descending-quality buckets: pid 0 holds the BEST rows. The stride
    // is a pure function of (lo, hi, nParts), so both passes key rows
    // identically — the packChunks determinism argument
    val stride = math.max((hi - lo) / nParts, java.lang.Double.MIN_NORMAL)
    val withPid = base.withColumn("pid",
      least(lit(nParts - 1),
        floor((lit(hi) - col("quality")) / lit(stride)).cast("int")))
    val totals = withPid.groupBy("pid").agg(sum("n_tok").as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val bases = {
      var acc = 0L
      totals.map { case (pid, t) => val o = acc; acc += t; (pid, o) }.toMap
    }
    // budget prune: a bucket whose BASE offset is already past the
    // budget cannot contribute a selected row — skip it entirely
    val live = totals.collect {
      case (pid, _) if bases(pid) < budgetTokens => pid
    }
    if (live.isEmpty) {
      return base.select(col("id"), col("quality"), col("n_tok"),
        col("n_tok").as("start_tok")).limit(0)
    }
    val local = withPid.filter(col("pid").isin(live: _*))
      .select(col("pid"), col("id"), col("quality"), col("n_tok"))
      .repartition(math.max(1, live.length), col("pid"))
      .sortWithinPartitions(col("pid"), col("quality").desc, col("id"))
      .as[(Int, Long, Double, Long)]
      .mapPartitions { it =>
        var cur = Int.MinValue
        var acc = 0L
        it.map { case (pid, id, q, n) =>
          if (pid != cur) { cur = pid; acc = 0L }
          val start = acc; acc += n; (pid, id, q, n, start)
        }
      }.toDF("pid", "id", "quality", "n_tok", "local_start")
    local
      .select(col("id"), col("quality"), col("n_tok"),
        (element_at(typedlit(bases), col("pid")) + col("local_start"))
          .as("start_tok"))
      .filter(col("start_tok") + col("n_tok") <= budgetTokens)
  }

  /** STAGED (annealing) mixture schedule: real pretraining runs change
    * the data mix ACROSS training — a long web-heavy main phase, then a
    * short "anneal" phase that upweights curated/high-quality sources
    * (the Llama-3 / MiniCPM recipe). Each phase is a full
    * [[mixtureEpochs]] allocation (per-source rate =
    * weight·phase_budget/tokens_s, floor(rate) whole epochs + a
    * deterministic hash-threshold fractional remainder), and phases
    * draw INDEPENDENT fractional subsets (the hash salt folds in the
    * phase id), so a doc can ride phase 1 and sit out phase 2 or vice
    * versa. Returns one row per (kept doc, phase) with that phase's
    * rate and copy count.
    *
    * Scale shape — deliberately NOT |phases| calls to [[mixtureEpochs]]
    * (each would re-aggregate and re-scan the corpus): ONE O(sources)
    * token-total aggregate shared by every phase, broadcast back, and
    * the per-phase decisions ride a single corpus pass as a
    * |phases|-element array that explodes to only the kept (doc, phase)
    * rows. Per-row integer/IEEE arithmetic throughout — bit-exact in
    * any ANSI engine, zero corpus shuffle at any number of phases. */
  def annealingMixture(
      df: DataFrame, idCol: String, sourceCol: String, tokenCount: Column,
      phases: Seq[(Int, Map[String, Double], Long)],
      defaultWeight: Double = 0.0, salt: Long = 0L): DataFrame = {
    require(phases.nonEmpty, "at least one phase")
    require(phases.map(_._1).distinct.size == phases.size,
      "phase ids must be distinct (the id salts the fractional draw)")
    val totals = df.groupBy(col(sourceCol))
      .agg(sum(tokenCount.cast("long")).as("tok_s"))
      .select(col(sourceCol).as("__mix_source"), col("tok_s"))
    val perPhase = phases.map { case (ph, weights, budget) =>
      val w = weights.foldLeft(lit(defaultWeight)) { case (acc, (s, f)) =>
        when(col(sourceCol) === lit(s), lit(f)).otherwise(acc)
      }
      val rate = w * lit(budget.toDouble) / col("tok_s").cast("double")
      val nCopies = floor(rate).cast("long") +
        when(hashBucket(col(idCol), salt + 1000003L * ph) <
          floor((rate - floor(rate)) * lit(P.toDouble)).cast("long"), 1L)
          .otherwise(0L)
      struct(lit(ph).as("phase"), rate.as("rate"), nCopies.as("n_copies"))
    }
    df.join(broadcast(totals), col(sourceCol) === col("__mix_source"))
      .select(col("*"), explode(array(perPhase: _*)).as("__ph"))
      .select((df.columns.map(col) :+
        col("__ph")("phase").as("phase") :+
        col("__ph")("rate").as("rate") :+
        col("__ph")("n_copies").as("n_copies")): _*)
      .filter(col("n_copies") > 0)
  }
}
