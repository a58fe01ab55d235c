package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-statistics language-model scoring — the CCNet-style "filter
  * by LM likelihood" quality stage. A real pipeline plugs a pretrained
  * model in at the same call site; this stand-in estimates unigram
  * probabilities from the corpus itself, which keeps the whole operator
  * engine-reproducible (count/total divisions and left-to-right double
  * sums — deliberately NOT ln()/perplexity, whose libm rounding differs
  * across engines and would break exact verification; the plumbing is
  * identical either way).
  *
  * Scale shape: counting is one distributed groupBy; only the
  * VOCABULARY reaches the driver (bounded — cap to top-K with a floor
  * default at web scale), and it rides the plan as a broadcast table
  * hashed once per executor ([[graft.functions.TokenScoreSum]]).
  * Scoring is per-row, shuffle-free.
  */
object LmOps {

  /** Round-14 (VERDICT r13 item 5): BPE training switches from
    * full per-round pair recounts to the incremental delta-maintained
    * count table once the recount's exploded-row count
    * (Σ over distinct words of |word|−1, measured once from the
    * materialized word cache) exceeds this threshold. Either mode
    * produces bit-identical merge tables (see the proof note in
    * [[bpeRun]]); the threshold only trades the incremental table's
    * fixed per-round floor against the recount's data-proportional
    * shuffle. The 2M default is where a 32-core recount stage clearly
    * outweighs the ~70 ms/round floor measured at fixture scale;
    * production corpora (10⁷+ distinct words ⇒ ≥10⁸ recount rows)
    * sit far above it. */
  val IncrementalRecountRowsConf = "spark.graft.bpe.incremental.minRecountRows"
  val IncrementalRecountRowsDefault = 2000000L

  private def incrementalThreshold(
      spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.getOption(IncrementalRecountRowsConf)
      .map(_.trim.toLong).getOrElse(IncrementalRecountRowsDefault)

  /** Full pair recount of a word-state frame: (l, r, c). */
  private def recount(d: DataFrame): DataFrame =
    pairRowsOf(d, "syms", 1)
      .groupBy(col("l"), col("r")).agg(sum(col("c")).as("c"))

  /** Recount rows observed by [[recount]]'s round-1 run (the exploded
    * adjacent-pair row count, Σ(|word|−1) over distinct words) — read
    * NON-blocking after the round-1 argmax action so the measurement
    * rides that job instead of scheduling its own. A missing metric
    * (AQE pruned the CollectMetrics over an empty corpus) means zero
    * rows: recount mode, harmless. */
  private def observedRows(obs: org.apache.spark.sql.Observation): Long =
    org.apache.spark.sql.graftbridge.Bridge.observationMetrics(obs)
      .get("n").flatMap(Option(_)).map(_.asInstanceOf[Long]).getOrElse(0L)

  /** Unigram probabilities (token -> count/total) estimated from the
    * corpus. @param topK keep only the most frequent topK tokens;
    * everything else scores the caller's default. The default cap is
    * deliberate: on a web corpus the distinct-token tail (typos,
    * garbage) is unbounded, and this table is collect()ed to the
    * driver and broadcast — an uncapped call is a driver OOM at scale.
    * Pass 0 to opt out explicitly (small closed vocabularies only). */
  def unigramProbs(df: DataFrame, textCol: String,
      topK: Int = 65536): Seq[(String, Double)] = {
    val counted = df.select(explode(TextOps.tokens(col(textCol))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
    val kept = if (topK > 0) counted.orderBy(col("c").desc, col("t")).limit(topK)
      else counted
    val rows = kept.collect()
    // total over the FULL corpus, not just kept rows, so capped tables
    // still give true probabilities
    val total =
      if (topK > 0) df.select(sum(size(TextOps.tokens(col(textCol)))))
        .collect().head.getLong(0).toDouble
      else rows.map(_.getLong(1)).sum.toDouble
    rows.map(r => r.getString(0) -> r.getLong(1).toDouble / total)
      .toSeq.sortBy(_._1)
  }

  /** Mean unigram probability of the document's tokens (higher = more
    * in-distribution). Left-to-right accumulation over the token order,
    * so any engine reproduces it bit-for-bit. */
  def avgTokenProb(text: Column, probs: Seq[(String, Double)],
      default: Double = 0.0): Column =
    graft.functions.native.token_score_sum(TextOps.tokens(text), probs, default) /
      TextOps.tokenCount(text).cast("double")

  /** Vocabulary coverage curve: the top-`k` tokens by corpus frequency
    * with rank, count, cumulative count, and the cumulative fraction
    * of ALL corpus tokens they cover — the tokenizer-design signal
    * ("how many word types cover 95% of the text decides vocabulary
    * size; the uncovered tail becomes subword splits"). Fully
    * distributed, nothing reaches the driver: one counting groupBy
    * (map-side combined), a TakeOrdered top-k of the AGGREGATED token
    * table (never the corpus), and the running sum windows over the
    * k-row slice only — the single-task window is k rows by
    * construction, not a corpus funnel. Ties break by token so the
    * curve is deterministic across engines. */
  def vocabCoverage(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val toks = df.select(explode(TextOps.tokens(col(textCol))).as("t"))
    val top = toks.groupBy("t").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("t")).limit(k)
    val total = toks.agg(count(lit(1)).as("total"))
    val curve = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("t"))
    top.crossJoin(broadcast(total))
      .select(row_number().over(curve).as("rank"), col("t").as("token"),
        col("cnt"),
        sum(col("cnt")).over(curve.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)).as("cum_cnt"),
        (sum(col("cnt")).over(curve.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)).cast("double") /
          col("total").cast("double")).as("coverage"))
  }

  /** Exact top-k frequent tokens WITHOUT a full-vocabulary shuffle —
    * the heavy-hitters shape for web-scale corpora, where the distinct
    * token tail (typos, hashes, garbage) is effectively unbounded and
    * [[vocabCoverage]]'s groupBy over it becomes the dominant shuffle.
    *
    * Three stages:
    *  1. per-partition Misra-Gries sketch (`counters` bounded slots,
    *     imperative per-partition state — the documented mapPartitions
    *     case): each task emits ≤ counters (token, weight) survivors;
    *  2. candidate set = the merged survivors (≤ tasks·counters rows —
    *     mergeable-summaries law: any token with global frequency
    *     > N/counters survives SOME partition's sketch);
    *  3. exact recount of the candidates only (broadcast semi-join +
    *     a groupBy over the candidate-pruned stream), top-k by
    *     (count desc, token).
    *
    * The result is provably EXACT — not approximate — whenever the
    * true k-th count exceeds N/counters; `guarantee_ok` carries that
    * check in-band (the caller sizes `counters` until it is true, the
    * same contract as IVF's recall assertion). MG survivor sets depend
    * on row order, but the FINAL output never does: recounts are exact
    * and the guarantee makes the candidate set a superset of the true
    * top-k under any ordering. */
  def heavyHitters(df: DataFrame, textCol: String, k: Int,
      counters: Int = 4096): DataFrame = {
    require(k > 0 && counters > k, s"need counters ($counters) > k ($k)")
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(explode(TextOps.tokens(col(textCol))).as("t"))
    val sketched = toks.as[String].mapPartitions { it =>
      val m = new java.util.HashMap[String, Long](counters * 2)
      it.foreach { t =>
        val c = m.get(t)
        if (c != 0L || m.containsKey(t)) m.put(t, c + 1L)
        else if (m.size < counters) m.put(t, 1L)
        else { // decrement-all, drop zeros (classic Misra-Gries step)
          val e = m.entrySet().iterator()
          while (e.hasNext) {
            val kv = e.next()
            if (kv.getValue == 1L) e.remove() else kv.setValue(kv.getValue - 1L)
          }
        }
      }
      scala.jdk.CollectionConverters.IteratorHasAsScala(
        m.entrySet().iterator()).asScala.map(kv => (kv.getKey, kv.getValue))
    }.toDF("t", "w")
    // candidate set: merged survivors, bounded by tasks·counters
    val candidates = sketched.groupBy(col("t")).agg(sum(col("w")).as("w"))
      .select(col("t"))
    val total = toks.agg(count(lit(1)).as("total"))
    val exact = toks.join(broadcast(candidates), Seq("t"), "left_semi")
      .groupBy(col("t")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("t")).limit(k)
    val order = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("t"))
    exact.crossJoin(broadcast(total))
      .select(row_number().over(order).as("rank"), col("t").as("token"),
        col("cnt"),
        (col("cnt") * lit(counters.toLong) > col("total")).as("guarantee_ok"))
  }

  /** Inverse-document-frequency table: token -> N/df (the RATIO form,
    * not ln(N/df) — libm rounding differs across engines and exactness
    * matters more here than the logarithm's compression; monotone in
    * the same order). One distinct-pair shuffle + one counting groupBy;
    * only the capped table reaches the driver (same bound rationale as
    * [[unigramProbs]]). */
  def idfTable(df: DataFrame, textCol: String,
      topK: Int = 65536): Seq[(String, Double)] = {
    val n = df.count().toDouble
    // each row is one document: distinct tokens per row, then one
    // counting groupBy — df(t) = number of docs containing t
    val dfCounts = df
      .select(explode(array_distinct(TextOps.tokens(col(textCol)))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("df"))
    val kept =
      if (topK > 0) dfCounts.orderBy(col("df").desc, col("t")).limit(topK)
      else dfCounts
    kept.collect().map(r => r.getString(0) -> n / r.getLong(1).toDouble)
      .toSeq.sortBy(_._1)
  }

  /** TF-IDF document score: Σ over token OCCURRENCES of idf(token)
    * (= Σ_t tf_t · idf_t), normalized by token count. Rides the same
    * once-hashed broadcast table as [[avgTokenProb]] — left-to-right
    * accumulation, per-row, shuffle-free, bit-reproducible. Tokens
    * outside the (capped) table score `default`. */
  def tfIdfScore(text: Column, idf: Seq[(String, Double)],
      default: Double = 0.0): Column =
    graft.functions.native.token_score_sum(TextOps.tokens(text), idf, default) /
      TextOps.tokenCount(text).cast("double")

  /** DSIR-style importance table (Xie et al. 2023, "Data Selection via
    * Importance Resampling"): per-token smoothed likelihood RATIO of a
    * small in-domain TARGET corpus against the RAW pool,
    *   ratio(t) = ((c_tgt(t)+1) · (N_raw+K)) / ((c_raw(t)+1) · (N_tgt+K)),
    * over the target's top-`topK` tokens (add-one smoothing keeps raw
    * zero-counts finite). Deliberately log-free: the ratio is one
    * division of products of exact integers (< 2⁵³), so ANY engine
    * reproduces it bit-for-bit — `ln` is where libm implementations
    * diverge by ulps, which an Exact hash-compared gate cannot absorb;
    * ranking by Σ ratio is order-equivalent to DSIR's Σ log-ratio
    * voting for the selection decision this feeds. Scale shape: two
    * counting groupBys (map-side combined), raw counts joined to the
    * broadcast kept-vocab, only the K-row table reaches the driver
    * (the [[unigramProbs]] bound contract). */
  def importanceRatios(target: DataFrame, raw: DataFrame, textCol: String,
      topK: Int = 65536): Seq[(String, Double)] = {
    require(topK > 0, "importanceRatios needs a capped vocabulary")
    val k = topK
    def counts(df: DataFrame) = df
      .select(explode(TextOps.tokens(col(textCol))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
    val kept = counts(target).orderBy(col("c").desc, col("t")).limit(k)
    def total(df: DataFrame): Long =
      df.select(sum(size(TextOps.tokens(col(textCol))))).collect()
        .head.getLong(0)
    val (nt, nr) = (total(target), total(raw))
    val rawKept = counts(raw)
      .join(broadcast(kept.select(col("t"))), Seq("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    kept.collect().map { r =>
      val t = r.getString(0)
      val ratio = ((r.getLong(1) + 1).toDouble * (nr + k).toDouble) /
        ((rawKept.getOrElse(t, 0L) + 1).toDouble * (nt + k).toDouble)
      t -> ratio
    }.toSeq.sortBy(_._1)
  }

  /** Bigram probabilities (adjacent-pair context — the CCNet-class
    * quality model one order up from [[unigramProbs]]): "w1 w2" →
    * count/total over the corpus's bigram occurrences. Same capped-
    * vocabulary contract and the same scale shape — the corpus pays one
    * counting groupBy (map-side combined), only the top-K table reaches
    * the driver. Packing pairs as single strings means the existing
    * broadcast score-table machinery serves bigrams unchanged. */
  def bigramProbs(df: DataFrame, textCol: String,
      topK: Int = 65536): Seq[(String, Double)] = {
    val counted = df.select(explode(TextOps.bigrams(col(textCol))).as("b"))
      .groupBy("b").agg(count(lit(1)).as("c"))
    val kept = if (topK > 0) counted.orderBy(col("c").desc, col("b")).limit(topK)
      else counted
    val rows = kept.collect()
    val total =
      if (topK > 0) df.select(sum(TextOps.bigramCount(col(textCol)).cast("long")))
        .collect().head.getLong(0).toDouble
      else rows.map(_.getLong(1)).sum.toDouble
    rows.map(r => r.getString(0) -> r.getLong(1).toDouble / total)
      .toSeq.sortBy(_._1)
  }

  /** Mean corpus probability of the document's bigrams — higher = more
    * in-distribution phrasing, the signal CCNet thresholds on. Single-
    * token docs (no bigrams) score `default` outright rather than 0/0.
    * Deliberately a probability MEAN, not ln-perplexity: libm rounding
    * differs across engines and the ordering is monotone-equivalent for
    * fixed-length comparisons (see the object doc). */
  def avgBigramProb(text: Column, probs: Seq[(String, Double)],
      default: Double = 0.0): Column = {
    val n = TextOps.bigramCount(text)
    when(n === 0, lit(default)).otherwise(
      graft.functions.native.token_score_sum(TextOps.bigrams(text), probs, default) /
        n.cast("double"))
  }

  /** CCNet-style quality bucket from an LM score: 'head' (the most
    * in-distribution tier, kept outright), 'middle' (kept, lower
    * priority), 'tail' (dropped or down-weighted). CCNet buckets by
    * fixed perplexity cutoffs from a reference model; these are the
    * same fixed cutoffs expressed on the probability scale. */
  def qualityBucket(score: Column, headMin: Double, middleMin: Double): Column =
    when(score >= lit(headMin), lit("head"))
      .when(score >= lit(middleMin), lit("middle"))
      .otherwise(lit("tail"))

  /** FastText-style hashed-bag-of-words linear classifier INFERENCE:
    * each token hashes into one of `buckets` feature slots (the
    * hashing trick — no vocabulary table at all), the slot's weight is
    * looked up, and the document score is the left-to-right sum of its
    * tokens' weights. This is the inference shape of the quality /
    * topicality classifiers real curation pipelines run over every
    * document (fastText, DSIR's discriminator, FineWeb-Edu's scorer):
    * per-row, model-free of corpus state, zero shuffles at any scale.
    *
    * The weight table here is IMPLICIT — weight(b) = an affine-mod mix
    * of the bucket index mapped into [-0.5, 0.5) — so the operator is
    * engine-reproducible end to end (the gate's DuckDB oracle replays
    * token hash, bucket, weight, and fold bit-for-bit). A trained
    * model swaps `weightOf` for an `Array[Double]` lookup riding the
    * closure (the NearestCentroids broadcast-tiny-model idiom); the
    * plan shape is identical.
    *
    * Token hash = the engine-independent [[graft.functions.PolyFingerprint]]
    * (base 31 mod 2³¹−1, always non-negative), so bucket and weight
    * arithmetic stay inside exact int64 range in any engine. */
  def hashedLinearScore(text: Column, buckets: Int = 4096,
      a: Long = 1103515245L, b: Long = 12345L, m: Long = 8191L): Column = {
    require(buckets > 0 && m > 1 &&
      (buckets.toLong - 1) * a + b > 0, "weight mix must stay positive")
    def weightOf(tok: Column): Column =
      ((graft.functions.native.poly_fingerprint(tok) % buckets) * a + b) % m
    val ws = transform(TextOps.tokens(text),
      t => weightOf(t).cast("double") / m.toDouble - 0.5)
    aggregate(ws, lit(0.0), (acc, x) => acc + x)
  }

  /** Good-Turing UNSEEN-MASS + lexical-diversity card per source — the
    * signal tokenizer sizing and corpus-coverage decisions start from:
    * the Good-Turing estimate of the probability mass on tokens NOT
    * yet seen is `V1/N` (singleton types over total tokens; Gale &
    * Sampson's simple Good-Turing keeps exactly this leading term), so
    * a source with high `p_unseen` still yields new vocabulary per
    * crawled token while one near zero is lexically saturated.
    * Type/token ratio rides along as the standard diversity number,
    * and V2 enables the next GT term downstream.
    *
    * Emitted in RATIONAL form (counts + one division of exact
    * integers) — no libm, bit-exact in any ANSI engine.
    *
    * Scale shape: ONE (source, token) counting shuffle (map-side
    * combine collapses each task to its distinct tokens first), then
    * an O(types) per-source aggregate — the p22/p47 budget; nothing
    * reaches the driver. */
  def unseenMass(df: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    val counts = df
      .select(col(sourceCol).as("source"),
        explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
    counts.groupBy(col("source"))
      .agg(sum(col("c")).cast("long").as("n_tokens"),
        count(lit(1)).as("v_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("v1_singletons"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("v2_doubletons"))
      .withColumn("p_unseen",
        col("v1_singletons").cast("double") / col("n_tokens"))
      .withColumn("ttr", col("v_types").cast("double") / col("n_tokens"))
  }

  /** DISTRIBUTED BPE-MERGE TOKENIZER TRAINING (Sennrich et al. 2016) —
    * the missing standard LLM-pipeline operator (p13 counts with a
    * FIXED pattern; p47/p78 size vocabularies but never learn merges).
    * Returns the learned merge table: (step, lsym, rsym, c) — step's
    * merged pair and its corpus-weighted adjacency count.
    *
    * The classic reduction: training state is the WORD-FREQUENCY table
    * (word, freq, symbol list), never the corpus — one counting shuffle
    * builds it, and every merge round operates on |distinct words| rows
    * regardless of corpus size. Each round: adjacent symbol pairs
    * explode with the word's freq as weight, ONE map-side-combined
    * groupBy counts them, and the argmax pair (ties broken
    * deterministically: highest count, then lexicographically smallest
    * lsym, then rsym) comes to the driver — O(1) rows per round,
    * O(nMerges) total driver traffic, the same bounded-collect contract
    * as [[unigramProbs]]. The merge then applies per row as a greedy
    * left-to-right fold (codegen'd `aggregate` HOF — a just-merged
    * symbol never re-merges as the RIGHT side of the same pair, but
    * participates in later rounds, the standard semantics), so
    * re-segmentation is shuffle-free.
    *
    * Words are restricted to `^[a-z0-9]+$` so the char-level seeding is
    * engine-exact (no grapheme-splitting ambiguity across engines).
    * Partition-invariant: counts are exact integers and the tie-break
    * is total. Scale: nMerges jobs over the persisted word table —
    * at 100 TB the word table is ~10⁷ rows (Heaps' law), pennies per
    * round next to the one corpus-counting shuffle. */
  def bpeTrain(df: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val (table, _, words) = bpeRun(df, textCol, nMerges)
    // the merge table is driver-built — the word table has no
    // remaining consumer here
    words.unpersist(blocking = false)
    table
  }

  /** BPE APPLICATION: segment the corpus with the merges learned by
    * the same `nMerges` training rounds and return the corpus TOKEN
    * HISTOGRAM (token, n) — the unit distribution a tokenizer trained
    * on this corpus actually emits, frequency-weighted. The natural
    * consumer of [[bpeTrain]]'s merge table: p47/p78 size vocabularies
    * from raw words; this sizes the POST-BPE distribution. Same
    * distributed shape as training — the histogram is one exploded
    * groupBy over the final \|distinct words\| state weighted by word
    * frequency; corpus rows never re-enter. The final state's persist
    * is registered with [[CacheRegistry]] (in-job composition hook). */
  def bpeSegment(df: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val (_, state, words) = bpeRun(df, textCol, nMerges)
    CacheRegistry.register(words)
    state.select(explode(col("syms")).as("token"), col("freq"))
      .groupBy(col("token")).agg(sum(col("freq")).as("n"))
  }

  /** TOKENIZER FERTILITY per source (post-BPE units per word — the
    * standard tokenizer-quality metric; high-fertility sources consume
    * disproportionate sequence length per word and skew loss masses):
    * merges learn on the WHOLE corpus (one tokenizer, like production),
    * then each source's word frequencies join the globally-segmented
    * state. Emitted in rational form: (source, n_words, n_units,
    * fertility = n_units/n_words) — one exact integer division, so the
    * audit is hash-exact in any engine.
    *
    * Scale shape: one (source, word) counting shuffle with map-side
    * combine + one word-keyed equi-join against the \|distinct words\|
    * state + an O(sources) aggregate — the p22/p47 budget on top of
    * training's bounded loop. */
  def bpeFertility(df: DataFrame, sourceCol: String, textCol: String,
      nMerges: Int): DataFrame = {
    val (_, state, words) = bpeRun(df, textCol, nMerges)
    CacheRegistry.register(words)
    val sw = df.select(col(sourceCol).as("source"),
        explode(split(col(textCol), " ")).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
      .groupBy(col("source"), col("word")).agg(count(lit(1)).as("f"))
    sw.join(state.select(col("word"), size(col("syms")).as("units")), "word")
      .groupBy(col("source"))
      .agg(sum(col("f")).as("n_words"),
        sum(col("f") * col("units")).as("n_units"))
      .withColumn("fertility",
        col("n_units").cast("double") / col("n_words"))
  }

  /** Adjacent-pair rows of `symsCol`, frequency-weighted and SIGNED:
    * (l, r, c = freq·sign). The shared spelling of both the full
    * round-start pair count (sign=+1 over the whole word table) and
    * the round-14 incremental count DELTAS (−1 over a changed word's
    * old syms, +1 over its new syms) — one posexplode, all codegen. */
  private def pairRowsOf(d: DataFrame, symsCol: String,
      sign: Int): DataFrame =
    d.filter(size(col(symsCol)) > 1)
      .select((col("freq") * lit(sign.toLong)).as("f"),
        posexplode(slice(col(symsCol), lit(1), size(col(symsCol)) - 1))
          .as(Seq("p", "l")),
        col(symsCol).as("ss"))
      .select(col("l"), element_at(col("ss"), col("p") + 2).as("r"),
        col("f").as("c"))

  /** Shared BPE training loop: (merge table, final segmented word
    * state (word, freq, syms) — persisted; the caller owns release). */
  private def bpeRun(df: DataFrame, textCol: String,
      nMerges: Int): (DataFrame, DataFrame, DataFrame) = {
    require(nMerges >= 1 && nMerges <= 4096, s"nMerges in [1,4096]: $nMerges")
    val spark = df.sparkSession
    val words = df
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"),
        // (?=.) splits before every char: no zero-width match at the
        // end (no trailing empty symbol), and Java never emits the
        // empty leading substring for a zero-width match at start
        split(col("word"), "(?=.)").as("syms"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // greedy left-to-right merge pass — ONE reference-object native
    // expression per generation ([[graft.functions.BpeApply]]; the
    // nested-`aggregate`-HOF spelling blew up analyzer/codegen far
    // below the 4096 cap, the NearestEval failure mode)
    def mergeFold(d: DataFrame, l: String, r: String): DataFrame =
      d.withColumn("syms",
        graft.functions.native.bpe_apply(col("syms"), Seq((l, r))))
    // `state` is the QUERY view of the current generation — a flat
    // LogicalRDD over a lineage-truncated, cached RDD
    // (Bridge.cutLineageCached): without the cut, generation k nests
    // all k prior projections — O(k²) analyzer cost, AQE plan-string
    // OOM near 64 merges, and task-deserialization StackOverflow on
    // the RDD chain (all found by TuneBpe, round 12 — the deeper form
    // of the nested-HOF ADVICE). `stateRdd` is the cached handle;
    // `prevRdd` the parent's, freed only AFTER the child materializes
    // (iterative-op discipline).
    var state = words
    var stateRdd: org.apache.spark.rdd.RDD[_] = null
    var prevRdd: org.apache.spark.rdd.RDD[_] = null
    // Round-14 (VERDICT r13 item 5, guide §1.3/§2 "shuffle fewer
    // bytes"): above [[IncrementalRecountRowsConf]] the pair-count
    // table is maintained INCREMENTALLY. Every round used to
    // re-explode the ENTIRE word table (Σ|word| rows — ~10⁸ at a
    // 100 TB corpus's ~10⁷-word table) just to re-rank counts that
    // mostly did not change. A merge (l,r) only changes the pair
    // multisets of words whose syms actually contain the adjacent
    // pair, so each round can fold an exact integer DELTA into the
    // previous round's table: −freq-weighted pairs of a changed
    // word's old syms, +freq-weighted pairs of its new syms (diffed
    // from the REAL before/after arrays, so any greedy-overlap
    // outcome of BpeApply is handled by construction).
    // counts_{k+1}(p) = counts_k(p) + Σ_changed[pairs_new − pairs_old]
    // is the recomputed count exactly, by induction — same longs,
    // same (c desc, l, r) argmax, bit-identical merge table (pinned
    // by Round11/12 hand-corpus + partition-invariance specs, TuneBpe
    // seq==batched, and the p81-p88 oracle gates), so the MODE SWITCH
    // below cannot change any result. Per-round shuffle drops from
    // Σ|word| exploded rows to |distinct pairs| + |changed explosion|
    // — the Zipf tail where most rounds touch few words is exactly
    // where the recount wasted the most. The table is lineage-cut per
    // generation like the word state (same O(k²) analyzer blowup
    // otherwise) and rides the SAME one-job-per-round protocol: the
    // argmax collect materializes this round's counts checkpoint
    // (pulling the previous counts cache + the parent state cache),
    // so no extra job is scheduled.
    //
    // WHY A THRESHOLD, not always-on: the maintained table has a
    // fixed per-round floor — one extra cached generation (the counts
    // checkpoint) plus two delta scan branches over the state cache —
    // that the tiny-task scheduler floor cannot amortize when the
    // full recount is itself a sub-50 ms stage (measured at sf0.1:
    // sequential 64-merge training 11.7 s → 16.5 s always-on). The
    // recount work is Σ(|word|−1) exploded rows, OBSERVED on the
    // round-1 argmax job itself (CollectMetrics on the exploded side
    // — no extra job, no extra pass); rounds 2+ run incremental iff
    // it exceeds the threshold, seeding the maintained table with one
    // recount of generation 1. Scale-adaptive by data size, not core
    // count; the local default keeps the fixture-scale path on the
    // recount spelling, byte-identical to round 13's execution.
    var counts: DataFrame = null // maintained table (incremental mode)
    var countsRdd: org.apache.spark.rdd.RDD[_] = null
    var prevCountsRdd: org.apache.spark.rdd.RDD[_] = null
    var incremental = false
    val rowsObs = org.apache.spark.sql.Observation()
    val round1Counts = pairRowsOf(words, "syms", 1)
      .observe(rowsObs, count(lit(1)).as("n"))
      .groupBy(col("l"), col("r")).agg(sum(col("c")).as("c"))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    // Round-13 loop-floor cut (same treatment as ClusterOps' fixpoint
    // loop): under AQE each argmax round decomposes into one job per
    // exchange (~2 jobs/merge of scheduling). Round 1 runs under the
    // session confs — its action materializes `words`' cache, and AQE
    // sizes that cache's partitions to the actual word-table bytes —
    // then the remaining rounds run AQE-free with shuffle partitions
    // DERIVED from that materialized layout (scale-adaptive: a 100 TB
    // corpus's ~10⁷-row word table keeps its size-appropriate count).
    // Counts are exact integer sums with a total tie order —
    // partitioning cannot change the argmax.
    //
    // SINGLE-QUERY-AT-A-TIME assumption (round-14, ADVICE r13): these
    // are SESSION-wide conf mutations — any concurrent query on the
    // same SparkSession would silently plan AQE-off with the
    // BPE-derived partition count until the `finally` restores them.
    // The harness runs one query at a time; concurrent callers must
    // run BPE training in a cloned session (SparkSession.cloneSession)
    // so the overrides cannot leak.
    val bpeSpark = df.sparkSession
    val prevAqe = bpeSpark.conf.getOption("spark.sql.adaptive.enabled")
    val prevParts = bpeSpark.conf.getOption("spark.sql.shuffle.partitions")
    try {
      var step = 1
      var exhausted = false
      while (step <= nMerges && !exhausted) {
        // the argmax collect IS the action that materializes (and
        // truncates) this generation's checkpoint — no separate
        // count() job per round (round 11: the extra materialization
        // jobs were half of p81/p82's suite cost). Round 1 ranks the
        // observed full recount; incremental mode ranks the maintained
        // table; recount mode re-ranks a fresh full recount of the
        // state — identical longs in every mode (see the mode-switch
        // note above).
        val bestDs = (if (step == 1) round1Counts
          else if (incremental) counts
          else recount(state))
          .orderBy(col("c").desc, col("l"), col("r"))
          .limit(1)
        val best = bestDs.collect()
        if (step == 1) {
          // `words` is materialized now — derive the loop layout and
          // the count-maintenance mode (both from the materialized
          // data, not from core count). The observation is completed
          // SYNCHRONOUSLY from the executed plan (the collect's own
          // listener ride is async — the checkpointTrackedSum lesson).
          val parts = math.max(1, words.rdd.getNumPartitions)
          bpeSpark.conf.set("spark.sql.adaptive.enabled", "false")
          bpeSpark.conf.set("spark.sql.shuffle.partitions", parts.toString)
          org.apache.spark.sql.graftbridge.Bridge
            .fireObservations(bestDs, "bpeRecountRows", 0L)
          incremental =
            observedRows(rowsObs) >= incrementalThreshold(bpeSpark)
        }
        // `state`'s parent and `counts`' predecessor are now cached
        // and past their last read: free them
        if (prevRdd != null) { prevRdd.unpersist(blocking = false); prevRdd = null }
        if (prevCountsRdd != null) {
          prevCountsRdd.unpersist(blocking = false); prevCountsRdd = null
        }
        if (best.isEmpty) exhausted = true
        else {
          val (l, r, c) = (best.head.getString(0), best.head.getString(1),
            best.head.getLong(2))
          merges += ((step, l, r, c))
          if (incremental) {
            // ONE scan serves both consumers (BpeStep): the cached
            // generation carries the merged syms AND the per-word
            // signed pair delta; the next state and the count update
            // are projections of it. The maintained table is seeded
            // with one recount of generation 1; thereafter each round
            // folds the exact delta. Pairs whose count reaches zero
            // leave the table (c > 0), so exhaustion is still "no
            // adjacent pair anywhere".
            val (gen, genRdd) = org.apache.spark.sql.graftbridge.Bridge
              .cutLineageCached(state.select(col("word"), col("freq"),
                graft.functions.native.bpe_step(col("syms"), col("freq"),
                  Seq((l, r))).as("st")))
            val next = gen.select(col("word"), col("freq"),
              col("st.syms").as("syms"))
            val (nextCounts, nextCountsRdd) =
              if (counts == null)
                org.apache.spark.sql.graftbridge.Bridge
                  .cutLineageCached(recount(next))
              else
                org.apache.spark.sql.graftbridge.Bridge.cutLineageCached(
                  counts.unionAll(gen.select(explode(col("st.pd")).as("d"))
                    .select(col("d.l"), col("d.r"), col("d.c")))
                    .groupBy(col("l"), col("r")).agg(sum(col("c")).as("c"))
                    .filter(col("c") > 0))
            prevCountsRdd = countsRdd
            countsRdd = nextCountsRdd
            counts = nextCounts
            prevRdd = stateRdd
            stateRdd = genRdd
            state = next
          } else {
            val (next, nextRdd) = org.apache.spark.sql.graftbridge.Bridge
              .cutLineageCached(mergeFold(state, l, r))
            prevRdd = stateRdd
            stateRdd = nextRdd
            state = next
          }
          step += 1
        }
      }
    } finally {
      prevAqe.fold(bpeSpark.conf.unset("spark.sql.adaptive.enabled"))(v =>
        bpeSpark.conf.set("spark.sql.adaptive.enabled", v))
      prevParts.fold(bpeSpark.conf.unset("spark.sql.shuffle.partitions"))(v =>
        bpeSpark.conf.set("spark.sql.shuffle.partitions", v))
    }
    // the loop's generations are no longer needed: the final
    // segmentation rebuilds as ONE native BpeApply projection over the
    // persisted `words` (all merges are known — a single expression
    // regardless of merge count, no persistence chain for the caller
    // to manage beyond `words`)
    if (stateRdd != null) stateRdd.unpersist(blocking = false)
    if (prevRdd != null) prevRdd.unpersist(blocking = false)
    if (countsRdd != null) countsRdd.unpersist(blocking = false)
    if (prevCountsRdd != null) prevCountsRdd.unpersist(blocking = false)
    val finalState = words.withColumn("syms",
      graft.functions.native.bpe_apply(col("syms"),
        merges.toSeq.map { case (_, l, r, _) => (l, r) }))
    import spark.implicits._
    (merges.toSeq.toDF("step", "lsym", "rsym", "c"), finalState, words)
  }

  /** BATCHED BPE training (round-12, VERDICT r11 item 5): production
    * vocabularies need ~32k merges, and [[bpeTrain]]'s one-job-per-
    * merge loop hits the scheduler floor (~120 ms/job ⇒ hours of pure
    * scheduling at 32k rounds) long before any data-size limit. Each
    * round here collects the TOP ranked pairs once (one job), admits
    * the maximal mutually-non-conflicting PREFIX of the ranking —
    * stopping at the first pair that shares a symbol (or merged
    * output) with an earlier admission, because skipping past a
    * conflict could reorder against the sequential argmax — and
    * applies the whole batch in one native fold. Rounds shrink by ~the
    * batch factor; driver traffic stays O(batch) rows per round.
    *
    * EXACTNESS — the strict-dominance trim (round 13; replaces the
    * round-12 post-batch rewind guard, whose "output-containing pair
    * counts are post-batch-invariant" premise had a tie-case hole: a
    * later admission (l_i,r_i) can consume occurrences ADJACENT to an
    * earlier output — "out_j l_i r_i" turns (out_j,l_i) into
    * (out_j,out_i), splitting its count across two pairs, so a
    * sequential mid-batch tie could hide below both fragments). The
    * round-13 rule needs NO extra job. Let c_conflict be the count of
    * the first NON-admitted ranking row (the stop row; −1 if the
    * exhaustive collect was fully admitted). Keep only the admissions
    * i ≥ 1 with c_i > c_conflict (admission 0 — the true round-start
    * argmax — is always kept). Proof this is sequential-exact, by
    * induction on steps: at step i sequential ranks (count desc, l, r)
    * over (a) admission i, whose count is still c_i (admitted pairs
    * are symbol-disjoint from each other and from outputs, so earlier
    * admissions never touch its occurrences); (b) non-output pairs,
    * whose counts only DECREASE under merges (a merge destroys
    * adjacent pairs and creates only output-containing ones) and which
    * rank below admission i at round start — later admissions and
    * trimmed rows lose even count-ties to it by the ranking's own lex
    * order, non-collected pairs have count ≤ c_conflict < c_i; and
    * (c) output-containing pairs P, each of whose occurrences at step
    * i spans a junction "… l_j r_j X …" that at ROUND START was an
    * occurrence of the unique BRIDGE pair (r_j, s) / (s, l_j) /
    * (r_j, l_m) — a pair sharing a symbol with admission j, hence
    * non-admitted (a conflicting row inside the prefix would have
    * stopped admission), hence count_start(bridge) ≤ c_conflict. So
    * c_P(step i) ≤ c_conflict < c_i and P cannot win even a lex
    * tiebreak, because ties cannot occur. Sequential's argmax at step
    * i is exactly admission i. ∎ (TuneBpe had measured the unguarded
    * divergence at merge 23 of 64: sequential's (c,o)→co enabled
    * (co,lu) mid-batch; c_(co,lu) ≤ c_conflict, so the trim cuts that
    * round at the boundary and re-ranks next round.) Count ties are
    * common in BPE tails, so the trim costs batch width there — but it
    * removes round 12's second job per round entirely, and the Zipf
    * head (where batching pays) is mostly strict. TuneBpe confirms
    * merge-for-merge equality with [[bpeTrain]] at 64/16 and 512/64;
    * the p86 gate proves it against the SEQUENTIAL oracle every round.
    *
    * `exact = false` admits the full non-conflicting prefix with no
    * trim (round 12's measured ~3× unguarded rate): output is a VALID
    * greedy-BPE variant but can diverge from sequential order once a
    * merge-created pair overtakes a stale-ranked admission (first
    * measured at merge 23 on the fixture); use only where bit-exact
    * vocabulary reproducibility does not matter. */
  def bpeTrainBatched(df: DataFrame, textCol: String, nMerges: Int,
      batch: Int = 4, exact: Boolean = true): DataFrame = {
    require(nMerges >= 1 && nMerges <= 65536,
      s"nMerges in [1,65536]: $nMerges")
    require(batch >= 1 && batch <= 256, s"batch in [1,256]: $batch")
    val spark = df.sparkSession
    val words = df
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"),
        split(col("word"), "(?=.)").as("syms"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // same lineage-cut view / cached-RDD-handle split as [[bpeRun]]
    var state = words
    var stateRdd: org.apache.spark.rdd.RDD[_] = null
    var prevRdd: org.apache.spark.rdd.RDD[_] = null
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    // Round-14: the same threshold-gated INCREMENTAL pair-count table
    // as [[bpeRun]] (see the mode-switch note there) — above the
    // recount-rows threshold each round folds the exact delta of the
    // batch's changed words into the previous table instead of
    // re-exploding the whole word table; identical longs by induction,
    // so the over-collect ranking, the conflict prefix, and the
    // strict-dominance trim see exactly the counts a recount would
    // produce (TuneBpe pins seq==batched merge-for-merge).
    var counts: DataFrame = null
    var countsRdd: org.apache.spark.rdd.RDD[_] = null
    var prevCountsRdd: org.apache.spark.rdd.RDD[_] = null
    var incremental = false
    val rowsObs = org.apache.spark.sql.Observation()
    val round1Counts = pairRowsOf(words, "syms", 1)
      .observe(rowsObs, count(lit(1)).as("n"))
      .groupBy(col("l"), col("r")).agg(sum(col("c")).as("c"))
    def fold(merges: Seq[(String, String)]) =
      org.apache.spark.sql.graftbridge.Bridge.cutLineageCached(
        state.withColumn("syms",
          graft.functions.native.bpe_apply(col("syms"), merges)))
    // same AQE-free derived-layout loop as [[bpeRun]] (round 13): round
    // 1 materializes `words` under the session confs (AQE sizes the
    // cache), later rounds run one job each
    val prevAqe = spark.conf.getOption("spark.sql.adaptive.enabled")
    val prevParts = spark.conf.getOption("spark.sql.shuffle.partitions")
    try {
    var exhausted = false
    var firstRound = true
    while (merges.size < nMerges && !exhausted) {
      val want = math.min(batch, nMerges - merges.size)
      // over-collect: conflicts consume ranking slots before the stop
      val topDs = (if (firstRound) round1Counts
        else if (incremental) counts
        else recount(state))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(want * 4 + 8)
      val top = topDs.collect()
      if (firstRound) {
        firstRound = false
        val parts = math.max(1, words.rdd.getNumPartitions)
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
        org.apache.spark.sql.graftbridge.Bridge
          .fireObservations(topDs, "bpeRecountRows", 0L)
        incremental = observedRows(rowsObs) >= incrementalThreshold(spark)
      }
      if (prevRdd != null) { prevRdd.unpersist(blocking = false); prevRdd = null }
      if (prevCountsRdd != null) {
        prevCountsRdd.unpersist(blocking = false); prevCountsRdd = null
      }
      if (top.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val admitted =
          scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var stop = false
        top.iterator.takeWhile(_ => !stop && admitted.size < want)
          .foreach { row =>
            val (l, r, c) =
              (row.getString(0), row.getString(1), row.getLong(2))
            if (used(l) || used(r) || used(l + r)) stop = true
            else {
              admitted += ((l, r, c))
              used += l; used += r; used += (l + r)
            }
          }
        // STRICT-DOMINANCE TRIM (see scaladoc): every mid-batch
        // challenger — a pair containing a batch output, or any
        // non-collected pair — has count ≤ the first non-admitted
        // ranking row's count, and only output-containing challengers
        // can win a lex tiebreak. Keeping admissions that STRICTLY
        // dominate that bound (index 0, the true round-start argmax,
        // is immune) makes the kept prefix provably sequential-exact
        // with no extra job. If the exhaustive collect was fully
        // admitted, no conflicting pair exists at round start, so no
        // output-containing pair can ever form this round: no bound.
        val cConflict =
          if (admitted.size < top.length) top(admitted.size).getLong(2)
          else -1L
        val keep =
          if (!exact) admitted.size
          else {
            val t = admitted.indexWhere({ case (_, _, c) =>
              c <= cConflict }, 1)
            if (t >= 1) t else admitted.size
          }
        val applied = admitted.take(math.max(keep, 1)).toSeq
        val appliedPairs = applied.map { case (l, r, _) => (l, r) }
        if (incremental) {
          // ONE scan serves both consumers (BpeStep; see bpeRun):
          // seed with one recount of generation 1, then fold the
          // exact delta of the words each batch actually changed
          val (gen, genRdd) = org.apache.spark.sql.graftbridge.Bridge
            .cutLineageCached(state.select(col("word"), col("freq"),
              graft.functions.native.bpe_step(col("syms"), col("freq"),
                appliedPairs).as("st")))
          val next = gen.select(col("word"), col("freq"),
            col("st.syms").as("syms"))
          val (nextCounts, nextCountsRdd) =
            if (counts == null)
              org.apache.spark.sql.graftbridge.Bridge
                .cutLineageCached(recount(next))
            else
              org.apache.spark.sql.graftbridge.Bridge.cutLineageCached(
                counts.unionAll(gen.select(explode(col("st.pd")).as("d"))
                  .select(col("d.l"), col("d.r"), col("d.c")))
                  .groupBy(col("l"), col("r")).agg(sum(col("c")).as("c"))
                  .filter(col("c") > 0))
          prevCountsRdd = countsRdd
          countsRdd = nextCountsRdd
          counts = nextCounts
          prevRdd = stateRdd
          stateRdd = genRdd
          state = next
        } else {
          val (next, nextRdd) = fold(appliedPairs)
          prevRdd = stateRdd
          stateRdd = nextRdd
          state = next
        }
        applied.foreach { case (l, r, c) =>
          merges += ((merges.size + 1, l, r, c))
        }
      }
    }
    } finally {
      prevAqe.fold(spark.conf.unset("spark.sql.adaptive.enabled"))(v =>
        spark.conf.set("spark.sql.adaptive.enabled", v))
      prevParts.fold(spark.conf.unset("spark.sql.shuffle.partitions"))(v =>
        spark.conf.set("spark.sql.shuffle.partitions", v))
    }
    if (stateRdd != null) stateRdd.unpersist(blocking = false)
    if (prevRdd != null) prevRdd.unpersist(blocking = false)
    if (countsRdd != null) countsRdd.unpersist(blocking = false)
    if (prevCountsRdd != null) prevCountsRdd.unpersist(blocking = false)
    words.unpersist(blocking = false)
    import spark.implicits._
    merges.toSeq.toDF("step", "lsym", "rsym", "c")
  }
}
