package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, all expressed
  * as declarative DataFrame plans so Catalyst/AQE handle distribution:
  *
  *   - exact dedup: hash-groupBy on a content fingerprint (one shuffle
  *     on the hash — the minimum possible);
  *   - n-gram shingling + exact Jaccard verification;
  *   - MinHash + LSH banding: candidate generation is a shuffle on
  *     (band, bandHash) buckets — never the O(n²) cross join — and
  *     only candidates pay the exact-Jaccard verification cost;
  *   - SimHash + 4-chunk banding for hamming-distance near-dups.
  *
  * Scale notes (100 TB): every step is per-row or bucket-local; bucket
  * skew (a viral boilerplate string landing 10⁶ docs in one bucket) is
  * the known hazard — cap bucket size with a count filter before the
  * pair explosion (`maxBucket`), which also bounds the quadratic term.
  */
object DedupOps {

  /** Word n-gram shingles (distinct) of single-space text, via the
    * native [[graft.functions.ShingleSet]] expression. */
  def shingles(text: Column, n: Int = 3): Column =
    graft.functions.native.shingle_set(split(text, " "), n)

  /** Exact dedup: keep the smallest id per normalized-content hash.
    * Returns (fingerprint, keeper_id, n_dups). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextOps.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_copies"))

  /** Unicode-robust dedup audit: documents whose NFC-normalized
    * fingerprints collide but whose BYTE-level fingerprints do not all
    * agree — the dup population exact dedup structurally misses
    * (composition-form drift from re-crawls through different
    * normalizers). Returns one row per member of every normalized dup
    * group: (fp_norm, keeper, doc id, group size, whether the raw
    * fingerprint already matched the keeper's). Same one-shuffle
    * groupBy shape as [[exactDedup]], on the normalized key; member
    * lists are bounded by per-document crawl multiplicity. */
  def unicodeDedupGroups(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fps = df.select(col(idCol).cast("long").as("id"),
      TextOps.nfcFingerprint(col(textCol)).as("fp_norm"),
      TextOps.fingerprint(col(textCol)).as("fp_raw"))
    val groups = fps.groupBy(col("fp_norm"))
      .agg(min(col("id")).as("keeper"), count(lit(1)).as("group_n"),
        // the keeper's raw fingerprint = raw fp of the min-id member:
        // min of (id, fp_raw) structs picks it deterministically
        min(struct(col("id"), col("fp_raw"))).getField("fp_raw")
          .as("keeper_fp_raw"))
      .filter(col("group_n") > 1)
    fps.join(groups, "fp_norm")
      .select(col("fp_norm"), col("keeper"), col("id"), col("group_n"),
        (col("fp_raw") === col("keeper_fp_raw")).as("raw_match"))
  }

  /** Train/eval SPLIT-LEAKAGE detector: every (eval doc, train doc)
    * pair sharing a content fingerprint — the integrity check run
    * AFTER splitting, because dedup-then-split only protects against
    * leakage the dedup pass saw (a re-crawl landing post-dedup, or
    * near-dups under a weaker normalization, silently contaminate
    * eval). Distinct from decontamination (p20): that screens against
    * an EXTERNAL benchmark; this audits the corpus's own splits.
    * One equi-join of (id, fingerprint) pairs — bodies never ride the
    * shuffle; at 100 TB the train side is the prebuilt fingerprint
    * index and the eval side rides [[buildFingerprintBloom]] first
    * (the p35 screen), making the audit Δ-proportional. */
  def splitLeakage(df: DataFrame, idCol: String, textCol: String,
      splitCol: String, trainLabel: String = "train"): DataFrame = {
    val fps = df.select(col(idCol).as("id"), col(splitCol).as("split"),
      TextOps.fingerprint(col(textCol)).as("fp"))
    val train = fps.filter(col("split") === trainLabel)
      .select(col("id").as("id_train"), col("fp"))
    val eval_ = fps.filter(col("split") =!= trainLabel)
      .select(col("id").as("id_eval"), col("split").as("eval_split"),
        col("fp"))
    eval_.join(train, "fp")
      .select(col("id_eval"), col("eval_split"), col("id_train"), col("fp"))
  }

  /** Exact Jaccard similarity between two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** MinHash signature via the native [[graft.functions.MinHashSig]]
    * expression: one tight JVM loop per row. The equivalent
    * `transform`/`aggregate` HOF formulation pays per-element
    * interpreted lambda evaluation — 27x slower on the sf0.1 bench. */
  def minhashSignature(sh: Column, k: Int): Column =
    graft.functions.native.minhash_sig(sh, k)

  /** LSH band keys: b bands of r rows each (k = b*r), hashed. */
  def bandKeys(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        xxhash64(slice(sig, b * rows + 1, lit(rows))).as("bh")))

  /** MinHash+LSH near-duplicate pairs with exact-Jaccard verification.
    *
    * @param tau      final Jaccard threshold (exact, on n-gram shingles)
    * @param bands×rows sized so P(catch | j ≥ tau) ≈ 1 (default 32×4:
    *                 1-(1-0.7⁴)³² ≈ 0.9998 at j=0.7)
    * @param maxBucket skew guard: buckets larger than this are dropped
    *                 (pathological boilerplate); count what was dropped
    *                 upstream if exactness matters.
    * @return (id_a, id_b, jaccard) with id_a < id_b
    */
  def minhashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      tau: Double = 0.7, bands: Int = 32, rows: Int = 4,
      ngram: Int = 3, maxBucket: Int = 1000,
      skewObs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    val withSh = df.select(col(idCol).as("id"),
        shingles(col(textCol), ngram).as("sh"))
      .filter(size(col("sh")) > 0)
    // banding carries ONLY (id, band, bh) — never the shingle arrays;
    // signature + band hashing are fused in one native expression
    val banded = withSh
      .select(col("id"),
        posexplode(graft.functions.native.minhash_bands(col("sh"), bands, rows)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bh")
    val cands = LshJoin.candidates(banded, Seq("band", "bh"), maxBucket, skewObs)
    // shingles join back only for the (small) candidate set
    LshJoin.attach(cands, withSh, "sh")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Incremental near-dup screen: MinHash+LSH candidates between a NEW
    * batch and an existing INDEX only — the daily-increment production
    * shape. A 100 TB historical corpus screens an increment at
    * Δ-proportional cost: banding both sides is per-row, the candidate
    * join is new.bands ⋈ index.bands on (band, bh) via
    * [[LshJoin.candidatesAcross]], and only candidates pay exact
    * Jaccard. Returns (id_new, id_idx, jaccard ≥ tau): the new docs to
    * drop (or link) because the corpus already contains them. */
  def minhashNewVsIndex(
      newDf: DataFrame, indexDf: DataFrame, idCol: String, textCol: String,
      tau: Double = 0.7, bands: Int = 32, rows: Int = 4,
      ngram: Int = 3, maxBucket: Int = 1000,
      skewObs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    def prep(df: DataFrame): DataFrame =
      df.select(col(idCol).as("id"), shingles(col(textCol), ngram).as("sh"))
        .filter(size(col("sh")) > 0)
    def band(withSh: DataFrame): DataFrame = withSh
      .select(col("id"),
        posexplode(graft.functions.native.minhash_bands(col("sh"), bands, rows)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bh")
    val newSh = prep(newDf)
    val idxSh = prep(indexDf)
    LshJoin.candidatesAcross(band(newSh), band(idxSh), Seq("band", "bh"),
        maxBucket, skewObs)
      .join(newSh.toDF("id_new", "sh_new"), "id_new")
      .join(idxSh.toDF("id_idx", "sh_idx"), "id_idx")
      .withColumn("jaccard", jaccard(col("sh_new"), col("sh_idx")))
      .filter(col("jaccard") >= tau)
      .select(col("id_new"), col("id_idx"), col("jaccard"))
  }

  /** Serialized Bloom filter over the index corpus's content
    * fingerprints — the materialized artifact of incremental EXACT
    * dedup (built nightly beside the fingerprint table, shipped to the
    * daily screen like [[graft.operators.VectorOps.saveIvfPqIndex]]'s
    * lists). Built distributed (`stat.bloomFilter` tree-aggregates);
    * only the O(bits) filter reaches the driver. */
  def buildFingerprintBloom(indexDf: DataFrame, textCol: String,
      expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    val bf = indexDf
      .select(TextOps.fingerprint(col(textCol)).as("fp"))
      .stat.bloomFilter("fp", expectedItems, fpp)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Incremental EXACT dedup: which new-batch docs already exist (by
    * content fingerprint) in the historical corpus — the exact-match
    * complement of [[minhashNewVsIndex]]. Two-stage screen, both
    * stages Δ-proportional:
    *
    *   1. the prebuilt Bloom filter ([[buildFingerprintBloom]]) drops
    *      the vast majority of new docs in one per-row, shuffle-free
    *      pass (no false negatives, so nothing true is lost);
    *   2. only Bloom survivors — expected `|Δ|·fpp` plus the true
    *      duplicates — pay the exact confirm join against the index's
    *      (fp, keeper) table, which removes the false positives. The
    *      SURVIVOR side broadcasts (it is small by construction); at
    *      warehouse scale the fingerprint table is bucketed by fp so
    *      the probe touches matching buckets only.
    *
    * Output (id_new, keeper) is EXACT — bloom false positives cannot
    * reach it — so the gate carries a plain SQL-join oracle. */
  def exactNewVsIndexBloom(newDf: DataFrame, indexFps: DataFrame,
      idCol: String, textCol: String, bloomBytes: Array[Byte]): DataFrame = {
    val newFp = newDf.select(col(idCol).as("id_new"),
      TextOps.fingerprint(col(textCol)).as("fp"))
    val survivors = newFp.filter(
      graft.functions.native.bloom_might_contain(col("fp"), bloomBytes))
    indexFps.join(broadcast(survivors), Seq("fp"))
      .select(col("id_new"), col("keeper"))
  }

  /** The index side of [[exactNewVsIndexBloom]]: one (fp, keeper) row
    * per distinct fingerprint — at scale a materialized table,
    * refreshed with the corpus. */
  def fingerprintIndex(indexDf: DataFrame, idCol: String,
      textCol: String): DataFrame =
    indexDf.groupBy(TextOps.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keeper"))

  /** Distinct word n-gram shingles of a benchmark/eval set, collected
    * to the driver. Deliberately driver-side: eval sets are small by
    * definition (the thing you decontaminate AGAINST, not the corpus),
    * and the collected set rides the plan as a broadcast literal — the
    * same "tiny model ships with the closure" idiom as k-means
    * centroids in [[VectorOps]]. */
  def benchmarkShingles(bench: DataFrame, textCol: String, n: Int): Seq[String] =
    bench.select(explode(shingles(col(textCol), n)).as("g"))
      .distinct().collect().map(_.getString(0)).toSeq.sorted

  /** Benchmark decontamination: per-document count of distinct word
    * n-grams shared with the benchmark shingle set (GPT-3-style n-gram
    * overlap screening). Per-row `array_intersect` against the
    * broadcast literal — shuffle-free over the corpus, which is the
    * 100 TB shape: one codegen pass over the scan, no join, no
    * aggregation. Returns only contaminated documents
    * (id, n_shared >= 1). */
  def contaminationCounts(corpus: DataFrame, idCol: String, textCol: String,
      benchShingles: Seq[String], n: Int): DataFrame =
    corpus.select(col(idCol).as("doc_id"),
        // native set-membership count: the benchmark set is hashed once
        // per executor, not per row (array_intersect re-hashes the
        // literal on every row — a scale-killer at eval-set sizes)
        graft.functions.native.in_set_count(shingles(col(textCol), n),
          benchShingles).as("n_shared"))
      .filter(col("n_shared") > 0)

  /** Brute-force n-gram Jaccard pairs — the oracle-shaped baseline for
    * small inputs and tests; O(n²), never run this at scale. */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      tau: Double, ngram: Int = 3): DataFrame = {
    val t = df.select(col(idCol).as("id"), shingles(col(textCol), ngram).as("sh"))
    val a = t.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = t.select(col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** EXACT set-similarity self-join with prefix filtering (the
    * SSJoin/PPJoin family — Chaudhuri et al. ICDE'06, Xiao et al.
    * WWW'08; the reference has no equivalent): every pair of documents
    * whose distinct word-n-gram sets have Jaccard ≥ tau, with ZERO
    * false negatives — the exact complement of the banded MinHash
    * screen ([[minhashLshPairs]]), for the curation stages where a
    * missed duplicate is a correctness bug (eval-set decontamination,
    * licensing dedup) rather than a recall trade.
    *
    * Prefix-filter principle: order shingles by ascending corpus
    * document frequency (rarest first, ties by shingle — any global
    * TOTAL order is correct; frequency order makes candidates fewest).
    * If |A∩B| ≥ ⌈tau·|A|⌉ (implied by J ≥ tau), the intersection
    * element with the smallest global order sits within the first
    * |A| − ⌈tau·|A|⌉ + 1 shingles of A — and symmetrically for B — so
    * any qualifying pair shares a shingle in both PREFIXES and banding
    * on prefix shingles is a lossless candidate generator. Unlike LSH
    * banding there is no recall knob and no skew cap: a boilerplate
    * shingle shared by the whole corpus has maximal frequency and
    * lands in nobody's prefix (for tau high enough that prefixes are
    * proper subsets), so hot buckets shrink as data grows instead of
    * exploding.
    *
    * Plan shape: one shuffle to count shingle document frequencies,
    * one equi-join to rank + one regroup to sort/slice each document's
    * prefix, then the shared [[LshJoin]] bucket machinery on prefix
    * shingles (+ the PPJoin length AND positional filters) and an
    * exact |∩|/|∪| verification attach. Candidate volume ∝
    * Σ_prefix-shingle bucket² — bounded by rare-shingle frequencies,
    * in practice ≪ n²; the positional filter then refutes candidates
    * whose overlap upper bound cannot reach τ BEFORE the shingle-array
    * attach (the expensive step), riding the same exchange the
    * pair-dedup already paid.
    *
    * Scale caveat: the rare-prefix bound assumes the shingle universe
    * GROWS with the corpus (true of natural text — n-gram universes
    * are heavy-tailed and unbounded). On a BOUNDED universe (the
    * synthetic fixture's ~30-word vocab caps distinct trigrams at
    * ~27k), every shingle eventually becomes frequent and candidates
    * degrade toward n²/|universe| — visible in the sf1 sweep, and a
    * property of the fixture, not the algorithm. At 100 TB of real
    * text, prefix shingles stay rare; the approximate MinHash screen
    * (p05/p31) remains the first pass and this operator the exact
    * confirm stage on its survivors. */
  def setSimJoinExact(df: DataFrame, idCol: String, textCol: String,
      tau: Double, ngram: Int = 3,
      candObs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    require(tau > 0 && tau < 1, s"tau must be in (0,1): $tau")
    verifyStageParallelism(df)
    // shingle IDENTITY only, never text: 8-byte hashed shingles
    // (native ShingleHashSet — no concatenated strings built) make the
    // frequency shuffle, the prefix sort, the banding keys, and the
    // per-pair intersect/union loops long-typed end to end. Measured
    // sf0.1: the string spelling was the suite's most expensive query
    // (7.5 s); Jaccard = |∩|/|∪| is identical under an injective
    // relabeling (collisions ~|universe|²/2⁶⁴, deterministic).
    val sets = CacheRegistry.register(
      df.select(col(idCol).as("id"),
          graft.functions.native.shingle_hash_set(
            split(col(textCol), " "), ngram).as("sh"))
        .filter(size(col("sh")) > 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val toks = sets.select(col("id"), explode(col("sh")).as("t"))
    // document frequency per shingle: `toks` is one row per (doc,
    // distinct shingle), so count(*) IS the document frequency
    val freq = toks.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val prefix = toks.join(freq, "t")
      .groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("df"), col("t")))).as("ts"))
      .select(col("id"), transform(
          slice(col("ts"), lit(1),
            (size(col("ts")) - ceil(size(col("ts")) * tau) + 1).cast("int")),
          s => s.getField("t")).as("pre"))
    // LENGTH FILTER (the second canonical PPJoin component): J ≥ tau
    // forces min(|A|,|B|) ≥ tau·max(|A|,|B|), so set sizes ride the
    // banding encoded into the id's low 12 bits and cross-size pairs
    // drop BEFORE deduplication and verification (measured sf0.1:
    // 248k → ~90k candidates for the same 256 true pairs). The size
    // saturates at 4095, which keeps the filter CONSERVATIVE (a
    // capped size can only under-reject), and the float comparison
    // carries a 1e-6 slack so a boundary pair with min = tau·max
    // exactly can never be lost to double rounding.
    // POSITIONAL FILTER (the third canonical PPJoin component, Xiao et
    // al. WWW'08): each banded row also carries the matching prefix
    // token's 1-based position in the document's frequency-sorted
    // shingle list, packed with the size into the id's low 24 bits
    // (id·2²⁴ + sz·2¹² + pos — ids must fit 39 bits; corpora with
    // wider ids should pre-map to a surrogate row_number). Key fact:
    // any SHARED token ordered before the m-th prefix match t_m sits
    // at positions below (i_m, j_m) in both sorted lists — positions
    // that are inside BOTH prefixes — so it is itself a prefix match.
    // Shared-before-or-at t_m is therefore EXACTLY m, giving the tight
    // per-match bound
    //   |A∩B| ≤ m + min(|A|−i_m, |B|−j_m)
    // valid for every m; the pair is refuted when the MINIMUM over its
    // matches falls below the required overlap α = τ/(1+τ)·(|A|+|B|).
    // Saturated sizes (sz = 4095) make positions inexact, so those
    // pairs skip the positional test — it can only ever under-reject.
    val banded = prefix.join(sets.select(col("id"),
          least(size(col("sh")), lit(4095)).cast("long").as("sz")), "id")
      .select((col("id") * 16777216L + col("sz") * 4096L).as("idsz"),
        posexplode(col("pre")).as(Seq("p0", "t")))
      .select((col("idsz") + least(col("p0") + 1, lit(4095))).as("id"),
        col("t"))
    // maxBucket = MaxValue: prefix filtering is EXACT — dropping a hot
    // bucket would break the zero-false-negative contract, and the
    // prefix construction is itself the skew bound (see scaladoc).
    // Round-14: the LENGTH filter is fused into the pair expansion
    // (candidatesRawSim / SortedPairsSim) — identical survivor set,
    // but the ~64 % cross-size pairs the old post-filter dropped are
    // never materialized or exchanged (guide §2.3; VERDICT r13 item 4).
    val raw = LshJoin.candidatesRawSim(banded, Seq("t"),
        maxBucket = Int.MaxValue, tau = tau)
      // unpack with INTEGRAL bit arithmetic only — Spark `/` is double
      // division, and a packed long above the 53-bit mantissa (doc ids
      // past ~2^29) would round a saturated low part into the NEXT id,
      // silently dropping/misattributing candidates. shiftright + `%`
      // (integral on longs) keep the full 39-bit id domain exact.
      .select(shiftright(col("id_a"), 24).as("id_a"),
        (shiftright(col("id_a"), 12) % 4096).as("sz_a"),
        (col("id_a") % 4096).as("pos_a"),
        shiftright(col("id_b"), 24).as("id_b"),
        (shiftright(col("id_b"), 12) % 4096).as("sz_b"),
        (col("id_b") % 4096).as("pos_b"))
    val grouped = raw
      .groupBy(col("id_a"), col("id_b"))
      .agg(array_sort(collect_list(struct(col("pos_a"), col("pos_b"))))
          .as("ps"),
        max(col("sz_a")).as("sz_a"), max(col("sz_b")).as("sz_b"))
      .withColumn("ub", array_min(zip_with(
        col("ps"), sequence(lit(1), size(col("ps"))),
        (p, m) => m + least(col("sz_a") - p.getField("pos_a"),
          col("sz_b") - p.getField("pos_b")))))
      .withColumn("pos_keep",
        col("sz_a") >= 4095 || col("sz_b") >= 4095 ||
          col("ub").cast("double")
            >= (col("sz_a") + col("sz_b")) * lit(tau / (1 + tau)) - 1e-6)
    val watched = candObs.fold(grouped)(o => grouped.observe(o,
      count(lit(1)).as("pairs_after_length"),
      sum(when(col("pos_keep"), 1L).otherwise(0L)).as("pairs_after_positional")))
    val cands = watched.filter(col("pos_keep"))
      .select(col("id_a"), col("id_b"))
    LshJoin.attach(cands, sets, "sh")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** EXACT set-CONTAINMENT join (Broder's containment C(A,B) =
    * |A∩B|/|A| — the asymmetric sibling of Jaccard resemblance): every
    * DIRECTED pair where at least `tau` of the contained document's
    * shingles appear in the container. This is the excerpt/quote/
    * page-within-site detector that resemblance structurally misses: a
    * 50-token excerpt of a 5000-token page has containment ~1.0 and
    * Jaccard ~0.01, so p69 never pairs them while training dedup very
    * much wants to (the excerpt adds no new content).
    *
    * Prefix filter, containment form: |A∩B| ≥ ⌈tau·|A|⌉ forces a shared
    * shingle inside A's rarest |A|−⌈tau·|A|⌉+1 — so only the CONTAINED
    * side prefixes. The container side must index ALL its shingles
    * (an excerpt's rare shingle can sit anywhere in B — there is no
    * sound container-side reduction for containment), so candidate
    * volume is Σ_{t ∈ prefixes} df(t): still rare-shingle-dominated
    * (prefixes hold each doc's rarest shingles), but unlike p69 a
    * corpus-hot shingle CAN land in a short doc's prefix and fan out
    * by its full document frequency — the inherent cost of exact
    * containment, and why `minShingles` (drop trivially short shingle
    * sets) is load-bearing at scale. Length filter: |B| ≥ tau·|A|
    * drops cross-size impossibilities before deduplication.
    *
    * Returns directed (contained, container, containment ≥ tau) rows;
    * mutual near-dups emit both directions. */
  def containmentJoin(df: DataFrame, idCol: String, textCol: String,
      tau: Double, ngram: Int = 3, minShingles: Int = 5,
      candObs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must be in (0,1]: $tau")
    verifyStageParallelism(df)
    val sets = CacheRegistry.register(
      df.select(col(idCol).as("id"),
          graft.functions.native.shingle_hash_set(
            split(col(textCol), " "), ngram).as("sh"))
        .filter(size(col("sh")) >= minShingles)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val toks = sets.select(col("id"), explode(col("sh")).as("t"))
    val freq = toks.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val prefix = toks.join(freq, "t")
      .groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("df"), col("t")))).as("ts"))
      .select(col("id"), transform(
          slice(col("ts"), lit(1),
            (size(col("ts")) - ceil(size(col("ts")) * tau) + 1).cast("int")),
          s => s.getField("t")).as("pre"))
    val szOf = sets.select(col("id"),
      least(size(col("sh")), lit(4095)).cast("long").as("sz"))
    val probeA = prefix.join(szOf, "id")
      .select((col("id") * 4096 + col("sz")).as("ida"), explode(col("pre")).as("t"))
    val indexB = toks.join(szOf, "id")
      .select((col("id") * 4096 + col("sz")).as("idb"), col("t"))
    val cands = probeA.join(indexB, "t")
      // integral unpack (shiftright, never `/` — see setSimJoinExact)
      .select(shiftright(col("ida"), 12).as("contained"),
        (col("ida") % 4096).as("sz_a"),
        shiftright(col("idb"), 12).as("container"),
        (col("idb") % 4096).as("sz_b"))
      .filter(col("contained") =!= col("container"))
      // |A∩B| <= min(|A|,|B|) and containment needs >= tau*|A|;
      // saturated sizes (4095) only under-reject
      .filter(col("sz_b").cast("double") >= col("sz_a") * tau - 1e-6)
      // dedup spelled as groupBy+count so ONE observe point yields both
      // the pre-dedup fan-out (sum of per-pair match multiplicities —
      // the hot-shingle candidate volume this operator's scaladoc
      // argues about) and the post-dedup pair count; same exchange as
      // dropDuplicates (ShuffleVolumeSpec pins the observed counts)
      .groupBy(col("contained"), col("container"))
      .agg(count(lit(1)).as("nmatch"))
    val watched = candObs.fold(cands)(o => cands.observe(o,
      sum(col("nmatch")).as("cands_after_length"),
      count(lit(1)).as("cands_after_dedup")))
    val pairs = watched.select(col("contained"), col("container"))
    val a = sets.toDF("contained", "sh_a")
    val b = sets.toDF("container", "sh_b")
    pairs.join(a, "contained").join(b, "container")
      .withColumn("containment",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
          / size(col("sh_a")))
      .filter(col("containment") >= tau)
      .select(col("contained"), col("container"), col("containment"))
  }

  /** APPROXIMATE containment screen + exact confirm — the p05↔p69
    * pattern applied to [[containmentJoin]] (round-12, VERDICT r11
    * item 3). Broder's identity makes containment samplable where it
    * is not LSH-able: for a random hash h, P(argmin over A of h ∈ B) =
    * \|A∩B\|/\|A\| = C(A,B), so k independent argmin shingles
    * ([[graft.functions.ContainmentMinHash]]) probed against the
    * container index give a Binomial(k, C) match count m, and
    * m ≥ minMatch screens pairs before any exact verification.
    *
    * Scale shape vs the exact path: the CONTAINED side emits k rows
    * per doc (constant — vs the prefix's (1−tau)·\|A\|+1, which grows
    * with document size), and because the screen's recall is a stated
    * probability rather than a zero-false-negative contract, the
    * container index MAY cap hot shingles (`maxBucket`) — the lever
    * the exact join structurally cannot use. At 100 TB: screen with a
    * cap and modest minMatch, then run [[containmentJoin]] (or direct
    * exact verification, as here) only on survivors. Screen recall at
    * the threshold: P(Bin(k, tau) ≥ minMatch) — defaults 16/8 give
    * ≥ 0.9993 at C = 0.9, exactly 1 at C = 1 (every argmin of A lies
    * in A∩B = A). False positives cost only verification.
    *
    * Engine-independent by construction (poly base hash + affine
    * seed rehash + binary tie-break), so a SQL oracle replays the
    * SCREEN itself — misses and all — not just the verified output.
    * Returns (contained, container, containment ≥ tau) for pairs that
    * passed the screen. */
  /** 62-bit engine-independent shingle join key: two independent
    * 31-bit polynomial fingerprints (bases 31 mod 2³¹−1 — the same
    * recurrence [[graft.functions.ContainmentMinHash]] seeds from —
    * and 37 mod 2147483629, the polySimhash pair) packed as
    * h₁·2³¹ + h₂ ∈ [0, 2⁶²). Replayable in SQL; collisions across
    * distinct shingles are ~n²/2⁶³ and only ever ADD candidates. */
  /** AQE coalescing floor for the EXACT pair joins (round-14, VERDICT
    * r13 item 3, guide §2.2): their candidate-pair exchanges carry a
    * few bytes per row but feed COMPUTE-dense stages (per-pair
    * positional refutation, shingle-set intersection), so AQE's
    * default 1 MB `coalescePartitions.minPartitionSize` folded them
    * to 1–5 tasks on a 32-core host (measured: p83's 718 ms verify
    * stage ran as ONE task). A 16 KB floor keeps ~task-per-core on
    * small-byte exchanges and is inert at scale (targets are
    * max(total/parallelism, floor), so any real total dominates).
    * Set at BUILD time — optimizer confs are read at execution and
    * builders cannot set-and-restore (the q28/r06 pattern; harnesses
    * sweep it between queries via SparkEntry.resetSessionConfs).
    * Deliberately NOT applied to the SCREENS: back-to-back A/B/C at
    * sf0.1 (5 reps) measured p83 2.71→1.81 s, p69 2.63→2.21 s, p79
    * 3.16→2.40 s under the 16 KB floor, but p89 2.60→4.12 s and p85
    * 1.83→3.06 s — the screens' probe⋈index stages are byte-bound,
    * not compute-bound, and fragmenting them costs more scheduling
    * than it buys parallelism. */
  private def verifyStageParallelism(df: DataFrame): Unit =
    df.sparkSession.conf.set(
      "spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")

  private def shingleKey(s: Column): Column = {
    val h1 = graft.functions.native.poly_fingerprint(s, 31L, 2147483647L)
    val h2 = graft.functions.native.poly_fingerprint(s, 37L, 2147483629L)
    h1 * 2147483648L + h2
  }

  def containmentScreen(df: DataFrame, idCol: String, textCol: String,
      tau: Double, ngram: Int = 3, minShingles: Int = 5,
      k: Int = 16, minMatch: Int = 8, maxBucket: Long = Long.MaxValue,
      candObs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must be in (0,1]: $tau")
    require(minMatch >= 1 && minMatch <= k,
      s"minMatch in [1,k=$k]: $minMatch")
    val sets = CacheRegistry.register(
      df.select(col(idCol).as("id"),
          graft.functions.native.shingle_set(
            split(col(textCol), " "), ngram).as("sh"))
        .filter(size(col("sh")) >= minShingles)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    def packed(c: Column): Column =
      c * 4096 + least(size(col("sh")), lit(4095)).cast("long")
    // round-13 shuffle-byte diet (VERDICT r12 item 2): the probe⋈index
    // exchange carries a 62-bit dual-polynomial key per shingle, not
    // the raw shingle string — several-fold fewer shuffle bytes at no
    // recall cost (a key collision only ADDS a candidate, and exact
    // verification recomputes the intersection from the cached string
    // sets). Engine-independent (two poly31-family fingerprints, the
    // polySimhash base pair), so the oracle still replays the screen.
    val probe = sets
      .select(packed(col("id")).as("ida"),
        explode(graft.functions.native.containment_minhash(col("sh"), k))
          .as("s"))
      .select(col("ida"), shingleKey(col("s")).as("t"))
    val indexAll = sets
      .select(packed(col("id")).as("idb"), explode(col("sh")).as("s"))
      .select(col("idb"), shingleKey(col("s")).as("t"))
    val index =
      if (maxBucket == Long.MaxValue) indexAll
      else indexAll.join(
        indexAll.groupBy(col("t")).agg(count(lit(1)).as("dfb"))
          .filter(col("dfb") > maxBucket).select(col("t")),
        Seq("t"), "left_anti")
    val scored = probe.join(index, "t")
      .select(shiftright(col("ida"), 12).as("contained"),
        (col("ida") % 4096).as("sz_a"),
        shiftright(col("idb"), 12).as("container"),
        (col("idb") % 4096).as("sz_b"))
      .filter(col("contained") =!= col("container"))
      .filter(col("sz_b").cast("double") >= col("sz_a") * tau - 1e-6)
      .groupBy(col("contained"), col("container"))
      .agg(count(lit(1)).as("m"))
    val watched = candObs.fold(scored)(o => scored.observe(o,
      count(lit(1)).as("cands_after_length"),
      sum(when(col("m") >= minMatch, 1L).otherwise(0L))
        .as("cands_after_screen")))
    val cand = watched.filter(col("m") >= minMatch)
      .select(col("contained"), col("container"))
    val a = sets.select(col("id").as("contained"), col("sh").as("sh_a"))
    val b = sets.select(col("id").as("container"), col("sh").as("sh_b"))
    cand.join(a, "contained").join(b, "container")
      .withColumn("containment",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
          / size(col("sh_a")))
      .filter(col("containment") >= tau)
      .select(col("contained"), col("container"), col("containment"))
  }

  /** INCREMENTAL containment screen: today's batch probed against an
    * EXISTING corpus index only — the Δ-proportional production shape
    * of [[containmentScreen]] (the p30/p32/p35 pattern applied to
    * excerpt detection). "Is this new document an excerpt of something
    * the corpus already has?" costs k argmin probe rows per NEW doc
    * against the index's shingle postings; the 100 TB historical side
    * is touched only through the (prebuilt, reusable) exploded index
    * and the per-candidate verification join — new×new and index×index
    * pairs are never formed. Same hashing, admission, and recall
    * contract as [[containmentScreen]]; returns directed
    * (id_new, id_idx, containment ≥ tau). */
  /** The (id, sh) shingle-set side of the containment screens, cached:
    * build ONCE per corpus side and reuse across probes — the
    * streaming runner ([[graft.streaming.StreamingOps
    * .screenStreamAgainstIndex]]) holds the index side across every
    * micro-batch. */
  def containmentSets(df: DataFrame, idCol: String, textCol: String,
      ngram: Int = 3, minShingles: Int = 5): DataFrame =
    CacheRegistry.register(
      df.select(col(idCol).as("id"),
          graft.functions.native.shingle_set(
            split(col(textCol), " "), ngram).as("sh"))
        .filter(size(col("sh")) >= minShingles)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  def containmentScreenNewVsIndex(newDf: DataFrame, indexDf: DataFrame,
      idCol: String, textCol: String, tau: Double, ngram: Int = 3,
      minShingles: Int = 5, k: Int = 16, minMatch: Int = 8,
      maxBucket: Long = Long.MaxValue): DataFrame = {
    val newSets = containmentSets(newDf, idCol, textCol, ngram, minShingles)
    val idxSets = containmentSets(indexDf, idCol, textCol, ngram, minShingles)
    containmentScreenSetsVsIndex(newSets, idxSets, tau, k, minMatch,
      maxBucket)
  }

  /** Core of [[containmentScreenNewVsIndex]] over PREBUILT
    * [[containmentSets]] sides — the streaming entry point (the index
    * side is built once, each micro-batch brings its own new side). */
  def containmentScreenSetsVsIndex(newSets: DataFrame, idxSets: DataFrame,
      tau: Double, k: Int = 16, minMatch: Int = 8,
      maxBucket: Long = Long.MaxValue): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must be in (0,1]: $tau")
    require(minMatch >= 1 && minMatch <= k,
      s"minMatch in [1,k=$k]: $minMatch")
    def packed(c: Column): Column =
      c * 4096 + least(size(col("sh")), lit(4095)).cast("long")
    // same 62-bit shingle-key exchange as [[containmentScreen]]
    val probe = newSets
      .select(packed(col("id")).as("ida"),
        explode(graft.functions.native.containment_minhash(col("sh"), k))
          .as("s"))
      .select(col("ida"), shingleKey(col("s")).as("t"))
    val indexAll = idxSets
      .select(packed(col("id")).as("idb"), explode(col("sh")).as("s"))
      .select(col("idb"), shingleKey(col("s")).as("t"))
    val index =
      if (maxBucket == Long.MaxValue) indexAll
      else indexAll.join(
        indexAll.groupBy(col("t")).agg(count(lit(1)).as("dfb"))
          .filter(col("dfb") > maxBucket).select(col("t")),
        Seq("t"), "left_anti")
    val cand = probe.join(index, "t")
      .select(shiftright(col("ida"), 12).as("id_new"),
        (col("ida") % 4096).as("sz_a"),
        shiftright(col("idb"), 12).as("id_idx"),
        (col("idb") % 4096).as("sz_b"))
      .filter(col("id_new") =!= col("id_idx"))
      .filter(col("sz_b").cast("double") >= col("sz_a") * tau - 1e-6)
      .groupBy(col("id_new"), col("id_idx"))
      .agg(count(lit(1)).as("m"))
      .filter(col("m") >= minMatch)
      .select(col("id_new"), col("id_idx"))
    val a = newSets.select(col("id").as("id_new"), col("sh").as("sh_a"))
    val b = idxSets.select(col("id").as("id_idx"), col("sh").as("sh_b"))
    cand.join(a, "id_new").join(b, "id_idx")
      .withColumn("containment",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
          / size(col("sh_a")))
      .filter(col("containment") >= tau)
      .select(col("id_new"), col("id_idx"), col("containment"))
  }

  /** 64-bit SimHash of a token array via the native
    * [[graft.functions.SimHash64]] expression (sign of per-bit ±1 sums
    * of token hashes) — one JVM loop per row, no shuffle, no UDF. */
  def simhash(tokens: Column): Column =
    graft.functions.native.simhash64(tokens)

  /** Engine-independent 62-bit SimHash (dual polynomial token hashes —
    * see [[graft.functions.SimHashPoly]]); unlike [[simhash]] a SQL
    * oracle reproduces it exactly, so gates on it carry the full hard
    * correctness signal. */
  def simhashPoly(tokens: Column): Column =
    graft.functions.native.simhash_poly(tokens)

  /** SimHash near-dup pairs with hamming distance ≤ maxDist, using
    * 4-chunk banding (pigeonhole: ≤3 differing bits ⇒ at least one
    * 16-bit chunk identical). Candidate buckets shuffle on the chunk
    * value; verification is bit_count(xor).
    *
    * ORACLE-STRENGTH FIXTURE variant (the p10 precedent), not the
    * default: 16-bit chunks cap the bucket count at 2¹⁶, so candidates
    * grow ∝ n²/2¹⁶ — measured 4.9× for 10× data at sf1. The DEFAULT
    * for real corpora is [[simhashWidePairs]] (124-bit, up to 2³¹
    * buckets, measured 1.6× for the same 10× AND absolutely faster at
    * both scales, same pigeonhole recall guarantee).
    *
    * @param poly use the cross-engine-reproducible polynomial hash
    *             family ([[simhashPoly]]) instead of xxhash64 — same
    *             banding, same verification, oracle-able output
    */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3, maxBucket: Int = 1000,
      skewObs: Option[org.apache.spark.sql.Observation] = None,
      poly: Boolean = false): DataFrame = {
    require(maxDist <= 3, "4-chunk banding guarantees recall only for maxDist <= 3")
    val hashFn = if (poly) simhashPoly _ else simhash _
    val sigs = df.select(col(idCol).as("id"),
      hashFn(split(col(textCol), " ")).as("sig"))
    val banded = sigs.select(col("id"),
      explode(expr(
        """transform(sequence(0, 3), c ->
          |  struct(c AS chunk, shiftright(sig, c * 16) & 65535 AS ck))""".stripMargin))
        .as("b"))
      .select(col("id"), col("b.chunk"), col("b.ck"))
    val cands = LshJoin.candidates(banded, Seq("chunk", "ck"), maxBucket, skewObs)
    LshJoin.attach(cands, sigs.select(col("id"), col("sig")), "sig")
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  /** Sliding-window repeated-SPAN detection — exact substring dedup,
    * the rolling-window approximation of suffix-array dedup from
    * "Deduplicating Training Data Makes Language Models Better" (Lee
    * et al. 2022): boilerplate (license headers, navigation chrome,
    * templated paragraphs) repeats across documents that are NOT
    * near-duplicates as wholes, so document-level dedup (p02/p05/p07)
    * never sees it. Every `window`-token sliding window is
    * fingerprinted (md5 of the window text — engine-independent);
    * windows whose fingerprint appears in ≥ `minDocs` distinct docs
    * are repeated spans. Returns the flagged (doc_id, wfp) window set
    * — the removal mask for span-level cleaning.
    *
    * Scale notes (100 TB): the window set is |corpus tokens| rows of
    * (id, 16-byte hash) — linear, and the shuffle on the fingerprint
    * is the inherent cost of substring-level dedup (the suffix array
    * pays a global sort of the same magnitude). `stride` samples every
    * s-th window: cost drops ×s, spans shorter than window+s-1 tokens
    * can slip through — the standard trade; windows stay codegen'd
    * built-ins end to end. */
  def repeatedSpanWindows(
      df: DataFrame, idCol: String, textCol: String,
      window: Int = 10, minDocs: Int = 2, stride: Int = 1): DataFrame = {
    val wins = spanWindows(df, idCol, textCol, window, stride)
    val flagged = wins.groupBy(col("wfp"))
      .agg(count_distinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("wfp"))
    wins.join(flagged, Seq("wfp"), "left_semi")
  }

  /** Remove cross-document boilerplate spans — the REMOVAL half of
    * the repeated-span pipeline ([[repeatedSpanWindows]] detects; this
    * strips). Token positions covered by ANY flagged window are cut
    * and the document is reassembled from the survivors. Returns every
    * input doc: (doc_id, n_tok, n_removed, cleaned_fp) with
    * `cleaned_fp` = md5 of the cleaned text, so the exact cleaned
    * CONTENT (not just counts) is verifiable by a reference engine.
    *
    * Scale shape: the window fingerprint shuffle is p36's inherent
    * cost; covered positions are ∝ flagged tokens only (docs with no
    * boilerplate never enter the position aggregation); the per-doc
    * cut set is bounded by the doc's own token count — the same
    * O(row) contract as holding the tokens. Stride is fixed at 1:
    * removal must not skip windows, or uncovered boilerplate tokens
    * survive (stride is a DETECTION sampling lever, p36).
    *
    * Fingerprint width: this path is DESTRUCTIVE (a colliding window
    * fingerprint falsely flags a unique span as repeated and cuts real
    * text from a kept document), so it matches on the 124-bit
    * [[graft.functions.GramFpsWide]] pair — birthday-safe to ~2⁶²
    * windows — where the p36 SCREEN keeps the cheaper 62-bit single
    * long (its false positive costs one over-counted stat row, not
    * content). */
  def removeRepeatedSpans(
      df: DataFrame, idCol: String, textCol: String,
      window: Int = 10, minDocs: Int = 2): DataFrame = {
    val toks = split(col(textCol), " ")
    val wins = df.select(col(idCol).as("doc_id"),
        posexplode(graft.functions.native.gram_fps_wide(col(textCol), window))
          .as(Seq("p0", "w")))
      .select(col("doc_id"), (col("p0") + 1).as("start"),
        col("w.f1").as("wfp"), col("w.f2").as("wfp2"))
    val flagged = wins.groupBy(col("wfp"), col("wfp2"))
      .agg(count_distinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("wfp"), col("wfp2"))
    val cut = wins.join(flagged, Seq("wfp", "wfp2"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("start"), col("start") + lit(window - 1)))
          .as("pos"))
      .distinct()
      .groupBy(col("doc_id")).agg(collect_set(col("pos")).as("cut"))
    val cutArr = coalesce(col("cut"),
      array().cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.IntegerType)))
    df.select(col(idCol).as("doc_id"), toks.as("toks"))
      .join(cut, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("toks")).as("n_tok"),
        size(cutArr).as("n_removed"),
        // round-13: native reassembly ([[graft.functions
        // .RemovePositions]]) — the HOF spelling (filter ∘ zip_with ∘
        // array_contains, then transform + array_join) evaluated
        // O(tokens·|cut|) interpreted lambdas per row; the native loop
        // builds the IDENTICAL space-joined string (same order, same
        // separator), so cleaned_fp's md5 is unchanged
        md5(graft.functions.native.remove_positions(col("toks"), cutArr))
          .as("cleaned_fp"))
  }

  /** Per-document repeated-span statistics over
    * [[repeatedSpanWindows]]: how much of each document is made of
    * cross-document boilerplate (the span-level analogue of p18's
    * within-document repetition signals). Returns every input doc:
    * (doc_id, n_windows, n_repeated, rep_ratio). */
  def repeatedSpanStats(
      df: DataFrame, idCol: String, textCol: String,
      window: Int = 10, minDocs: Int = 2, stride: Int = 1): DataFrame = {
    val wins = spanWindows(df, idCol, textCol, window, stride)
    val marked = repeatedSpanWindows(df, idCol, textCol, window, minDocs, stride)
    val nAll = wins.groupBy(col("doc_id")).agg(count(lit(1)).as("n_all"))
    val nRep = marked.groupBy(col("doc_id")).agg(count(lit(1)).as("n_rep"))
    df.select(col(idCol).as("doc_id"))
      .join(nAll, Seq("doc_id"), "left")
      .join(nRep, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_all"), lit(0L)).as("n_windows"),
        coalesce(col("n_rep"), lit(0L)).as("n_repeated"),
        when(coalesce(col("n_all"), lit(0L)) > 0,
          coalesce(col("n_rep"), lit(0L)).cast("double") / col("n_all"))
          .otherwise(0.0).as("rep_ratio"))
  }

  /** (doc_id, wfp) for every stride-th `window`-token window, wfp a
    * 62-bit dual-poly long (native [[graft.functions.GramFps]] — one
    * pass per row; replaces the md5-hex spelling whose 32-char strings
    * were built per window and shuffled — the fingerprint exchange now
    * rides 8-byte longs, 4× less payload at any scale). Docs shorter
    * than `window` tokens emit nothing. */
  private def spanWindows(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame =
    df.select(col(idCol).as("doc_id"),
        posexplode(graft.functions.native.gram_fps(col(textCol), window))
          .as(Seq("p0", "wfp")))
      .filter(col("p0") % stride === 0)
      .select(col("doc_id"), col("wfp"))

  /** Second independent polynomial family — the other 62 bits of
    * [[simhashWidePairs]]'s 124-bit signature. */
  def simhashPoly2(tokens: Column): Column =
    graft.functions.native.simhash_poly2(tokens)

  /** 124-bit SimHash near-dup pairs — the SCALE answer to
    * [[simhashPairs]]'s bounded bucket count. Pigeonholing a 62-bit
    * signature into 4 chunks caps buckets at 2¹⁶ per chunk, so
    * candidates grow ∝ n²/2¹⁶ no matter how big the corpus gets. Two
    * independent dual-poly signatures give 124 bits → 4 chunks of 31
    * bits → up to 2³¹ buckets: same pigeonhole recall guarantee (≤
    * `maxDist` ≤ 3 differing bits leave at least one chunk identical),
    * candidate volume ∝ n·avg_bucket. Hamming distance is measured
    * over the CONCATENATED 124-bit signature, so the pair set is a
    * (stricter) subset of the 62-bit operator's at equal maxDist —
    * fewer lookalike false positives, too. Oracle-able exactly: both
    * families are polynomial-mod-prime + fmix, reproduced in SQL. */
  def simhashWidePairs(
      df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3, maxBucket: Int = 1000,
      skewObs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    require(maxDist <= 3, "4-chunk banding guarantees recall only for maxDist <= 3")
    val sigs = wideSignatures(df, idCol, textCol)
    val cands = LshJoin.candidates(wideBanded(sigs), Seq("chunk", "ck"),
      maxBucket, skewObs)
    LshJoin.attach(cands,
        sigs.select(col("id"), struct(col("sig1"), col("sig2")).as("ss")), "ss")
      .select(col("id_a"), col("id_b"),
        wideHamming(col("ss_a"), col("ss_b")).as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  /** Incremental + wide, composed: screen a NEW batch against an
    * existing INDEX with the 124-bit signature — the two scale answers
    * (Δ-proportional candidates, unbounded bucket count) in one
    * operator. The production daily shape for a 100 TB simhash
    * corpus: the index's banded table is materialized once, each
    * increment equi-joins it by (chunk, ck). */
  def simhashWideNewVsIndex(
      newDf: DataFrame, indexDf: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3, maxBucket: Int = 1000,
      skewObs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    require(maxDist <= 3, "4-chunk banding guarantees recall only for maxDist <= 3")
    val newSigs = wideSignatures(newDf, idCol, textCol)
    val idxSigs = wideSignatures(indexDf, idCol, textCol)
    LshJoin.candidatesAcross(wideBanded(newSigs), wideBanded(idxSigs),
        Seq("chunk", "ck"), maxBucket, skewObs)
      .join(newSigs.select(col("id").as("id_new"),
        struct(col("sig1"), col("sig2")).as("ss_new")), "id_new")
      .join(idxSigs.select(col("id").as("id_idx"),
        struct(col("sig1"), col("sig2")).as("ss_idx")), "id_idx")
      .select(col("id_new"), col("id_idx"),
        wideHamming(col("ss_new"), col("ss_idx")).as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  private def wideSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    df.select(col(idCol).as("id"),
      simhashPoly(toks).as("sig1"), simhashPoly2(toks).as("sig2"))
  }

  private def wideBanded(sigs: DataFrame): DataFrame =
    sigs.select(col("id"), explode(expr(
        """array(
          |  struct(0 AS chunk, sig1 & 2147483647 AS ck),
          |  struct(1 AS chunk, shiftright(sig1, 31) & 2147483647 AS ck),
          |  struct(2 AS chunk, sig2 & 2147483647 AS ck),
          |  struct(3 AS chunk, shiftright(sig2, 31) & 2147483647 AS ck))"""
          .stripMargin)).as("b"))
      .select(col("id"), col("b.chunk"), col("b.ck"))

  /** Hamming distance over the concatenated 124-bit signature (both
    * structs must carry sig1/sig2). */
  private def wideHamming(a: Column, b: Column): Column =
    (bit_count(a.getField("sig1").bitwiseXOR(b.getField("sig1"))) +
      bit_count(a.getField("sig2").bitwiseXOR(b.getField("sig2"))))
      .cast("int")

  /** Cross-source n-gram overlap matrix: for every source pair, the
    * count of shared distinct word n-grams and the Jaccard similarity
    * of the two sources' n-gram sets — the corpus-composition audit
    * run before mixing (how much of source B is already in source A;
    * C4-vs-CommonCrawl-style overlap studies).
    *
    * Scale shape (round-9): the corpus-sized work is ONE aggregation —
    * `groupBy(shingle).agg(bit_or(1L << source_bit))`, a single shuffle
    * on the shingle whose aggregate state is ONE LONG (each source a
    * bit; universes are bounded — dozens, not thousands) — then a
    * second tiny `groupBy(mask).count()` collapses the corpus to at
    * most 2^|sources| distinct-mask rows before ANY in-row pair
    * expansion. Per-source sizes are read off the matrix DIAGONAL via
    * two windows over the |sources|²-row result, so the corpus subtree
    * is evaluated exactly once (round-7 self-joined the corpus-sized
    * distinct — 19.7× for 10× data; round-8's collect_set spelling ran
    * on ObjectHashAggregate whose sort-based fallback made suite-order
    * sf1 reps spill-bound). */
  def sourceOverlap(df: DataFrame, srcCol: String, textCol: String,
      n: Int = 3, knownSources: Option[Seq[String]] = None): DataFrame = {
    // source universes are bounded (corpus mixes name dozens of
    // sources, not thousands): encode each source as a BIT and make the
    // corpus-sized aggregation a LONG bit_or — a codegen'd
    // HashAggregate with 8-byte state, perfect map-side partials and
    // (shingle, long) shuffle rows. The round-8 collect_set spelling
    // ran on ObjectHashAggregateExec, whose per-partition fallback to
    // sort-based aggregation (default after 128 distinct keys) made the
    // suite-order sf1 reps spill-bound and 3-4× a focused run
    // (VERDICT r8 finding 2); the bit_or path has no object state and
    // no sort fallback. Sources >64 fall back to the set spelling.
    //
    // `knownSources`: the source universe is pipeline CONFIGURATION in
    // a real mixing run (the same standing the p38/p43 mixture weights
    // have) — callers that know it skip the discovery job; when
    // omitted, one column-pruned distinct derives it from the data.
    // Round-14: the (shingle-hash, mask) exchange is byte-small but
    // its post-shuffle aggregate is the gate's densest stage (measured
    // 1.15 s as ONE task inside p60's 1.9 s) — same 16 KB floor as
    // verifyStageParallelism / LshJoin.expansionParallelism
    verifyStageParallelism(df)
    val srcs = knownSources.map(_.map(String.valueOf(_: Any)).sorted.toArray)
      .getOrElse(df.select(col(srcCol).cast("string").as("s"))
        .distinct().collect().map(_.getString(0)).sorted)
    if (srcs.length > 64)
      return sourceOverlapSets(df, srcCol, textCol, n)
    val bitOf = map(srcs.zipWithIndex.flatMap { case (s, i) =>
      Seq(lit(s), lit(i)) }: _*)
    val nameOf = map(srcs.zipWithIndex.flatMap { case (s, i) =>
      Seq(lit(i), lit(s)) }: _*)
    val byShMask = df.select(
        element_at(bitOf, col(srcCol).cast("string")).as("bit"),
        explode(shingles(col(textCol), n)).as("sh"))
      // Scala functions.shiftleft only takes a literal shift; the SQL
      // form shifts by a column. The shuffle key is the shingle's
      // 64-bit hash, not the string: same distinct-count semantics
      // (xxhash64 collisions over a bounded shingle universe are
      // ~|U|²/2⁶⁵ — vanishing, and deterministic either way), smaller
      // shuffle rows, cheaper aggregate hashing. The audit never needs
      // the shingle TEXT — only its identity.
      .select(expr("shiftleft(CAST(1 AS BIGINT), bit)").as("bv"),
        xxhash64(col("sh")).as("sh"))
      .groupBy(col("sh"))
      .agg(bit_or(col("bv")).as("mask"))
    // distinct masks ≤ min(#shingles, 2^|sources|) — the per-mask tally
    // collapses the corpus to a tiny frame BEFORE any in-row expansion
    val maskCounts = byShMask.groupBy(col("mask")).agg(count(lit(1)).as("c"))
    val counts = maskCounts
      .withColumn("bits", expr(s"""filter(sequence(0, ${srcs.length - 1}),
        |  i -> (shiftright(mask, i) & 1) = 1)""".stripMargin))
      .select(explode(expr(
        """flatten(transform(bits, (x, i) -> concat(
          |  array(struct(x AS ba, x AS bb)),
          |  transform(slice(bits, i + 2, size(bits)),
          |    y -> struct(x AS ba, y AS bb)))))""".stripMargin))
        .as("e"), col("c"))
      .groupBy(col("e.ba").as("ba"), col("e.bb").as("bb"))
      .agg(sum(col("c")).as("cnt"))
      .select(element_at(nameOf, col("ba")).as("src_a"),
        element_at(nameOf, col("bb")).as("src_b"), col("cnt"))
    overlapMatrixTail(counts)
  }

  /** collect_set spelling of [[sourceOverlap]]'s corpus aggregation —
    * the >64-source fallback (no bit budget) and the shape the round-8
    * version used for every cardinality. */
  private def sourceOverlapSets(df: DataFrame, srcCol: String,
      textCol: String, n: Int): DataFrame = {
    val bySh = df.select(col(srcCol).as("source"),
        explode(shingles(col(textCol), n)).as("sh"))
      .groupBy(col("sh"))
      .agg(array_sort(collect_set(col("source"))).as("srcs"))
    // in-row expansion: diagonal (x,x) rows carry per-source shingle
    // counts; ordered (x,y) x<y rows carry the shared counts
    val counts = bySh.select(explode(expr(
        """flatten(transform(srcs, (x, i) -> concat(
          |  array(struct(x AS src_a, x AS src_b)),
          |  transform(slice(srcs, i + 2, size(srcs)),
          |    y -> struct(x AS src_a, y AS src_b)))))""".stripMargin))
        .as("e"))
      .groupBy(col("e.src_a").as("src_a"), col("e.src_b").as("src_b"))
      .agg(count(lit(1)).as("cnt"))
    overlapMatrixTail(counts)
  }

  /** (src_a, src_b, cnt) matrix incl. diagonal → final overlap rows:
    * per-source sizes read off the DIAGONAL via two windows over the
    * ≤|sources|² matrix, then the ordered off-diagonal with Jaccard. */
  private def overlapMatrixTail(counts: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    counts
      .withColumn("n_a", max(when(col("src_a") === col("src_b"),
        col("cnt"))).over(Window.partitionBy("src_a")))
      .withColumn("n_b", max(when(col("src_a") === col("src_b"),
        col("cnt"))).over(Window.partitionBy("src_b")))
      .filter(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"), col("cnt").as("n_shared"),
        col("n_a"), col("n_b"))
      .withColumn("jaccard", col("n_shared").cast("double") /
        (col("n_a") + col("n_b") - col("n_shared")))
  }

  /** CCNet-style cross-document CHUNK dedup: split every document into
    * fixed-size non-overlapping token chunks, fingerprint each chunk,
    * count how many DOCUMENTS each fingerprint appears in corpus-wide,
    * and report per document how much survives dropping every chunk
    * seen elsewhere — the sub-document dedup that removes boilerplate
    * (cookie banners, navigation, license headers) exact doc-level
    * dedup structurally misses, because the surrounding document is
    * unique even when the paragraph is not.
    *
    * Returns (doc_id, n_chunks, n_dropped, kept_tokens, kept_frac).
    *
    * Scale shape: two shuffles, both on the chunk fingerprint — the
    * document-count groupBy and the join back — each ∝ corpus chunks,
    * the same budget as exact dedup one granularity down. The join is
    * an equi-join on fp; a viral chunk fans out to its occurrence list
    * but carries only a counter, never a pair explosion. */
  def chunkDedupStats(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int): DataFrame = {
    val chunks = df.select(col(idCol).as("doc_id"),
        explode(TextOps.chunkTokens(col(textCol), chunkSize, 0)).as("chunk"))
      .select(col("doc_id"), md5(col("chunk")).as("fp"),
        size(split(col("chunk"), " ")).as("n_tok"))
    val counts = chunks.groupBy("fp")
      .agg(countDistinct(col("doc_id")).as("n_docs"))
    chunks.join(counts, "fp")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("n_docs") === 1, col("n_tok")).otherwise(0))
          .cast("long").as("kept_tokens"),
        (sum(when(col("n_docs") === 1, col("n_tok")).otherwise(0))
          .cast("double") / sum(col("n_tok"))).as("kept_frac"))
  }

  /** WINNOWING fingerprint selection (Schleimer/Wilkerson/Aiken 2003 —
    * the MOSS algorithm): hash every `k`-token gram, slide a window of
    * `w` consecutive gram hashes, keep each window's MINIMUM, ties
    * broken by the RIGHTMOST position (the paper's robust winnowing —
    * re-selecting an already-selected hash where possible minimizes
    * the selection count). The union of window minima is the
    * document's fingerprint set, with the paper's two guarantees:
    *
    *   - any token-substring match of length ≥ w+k-1 between two
    *     documents shares at least one SELECTED fingerprint — a
    *     detection GUARANTEE random sampling cannot give, and
    *   - expected density 2/(w+1): only that fraction of gram hashes
    *     is ever selected.
    *
    * The density is the scale story vs [[repeatedSpanWindows]] (p36),
    * which shuffles EVERY window fingerprint: winnowing ships the
    * provably-sufficient subset, cutting the (doc_id, fp) exchange
    * ~(w+1)/2× while keeping the ≥ w+k-1 detection threshold. At
    * 100 TB the exchange is the whole cost of span-level dedup, so the
    * factor is wall-clock, not cosmetic.
    *
    * Selection is ONE native pass per row
    * ([[graft.functions.native.winnow_fps]]): no shuffle, no state,
    * partition-invariant. Gram hashes are the integer poly family the
    * CDC chunker already uses (token ·31 / window ·1000003, both mod
    * 2³¹−1) — SQL-replayable via the p74 `list_reduce` spelling — so
    * window minima order identically on any engine while costing
    * integer compares instead of the md5-hex strings the first cut of
    * this operator built per gram (measured 3.25 s → sub-second at
    * sf0.1 for the p76 gate).
    *
    * Returns (doc_id, pos, fp): one row per distinct selected
    * (position, gram hash). Docs with fewer than `k` tokens emit
    * nothing; docs with fewer than `w` grams winnow their single short
    * window. */
  def winnowingSelect(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4): DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(graft.functions.native.winnow_fps(col(textCol), k, w))
          .as("s"))
      .select(col("doc_id"), col("s")("pos").as("pos"),
        col("s")("fp").as("fp"))
}
