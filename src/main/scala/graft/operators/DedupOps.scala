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

  /** Word n-gram shingles (distinct) of single-space text. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = split(text, " ")
    array_distinct(
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*)))
  }

  /** Exact dedup: keep the smallest id per normalized-content hash.
    * Returns (fingerprint, keeper_id, n_dups). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextOps.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_copies"))

  /** Exact Jaccard similarity between two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** MinHash signature: k hash functions over the shingle set, realized
    * as xxhash64(shingle, seed_j) — codegen'd, no UDF. */
  def minhashSignature(sh: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      j => array_min(transform(sh, s => xxhash64(s, j))))

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
      ngram: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val withSh = df.select(col(idCol).as("id"),
        shingles(col(textCol), ngram).as("sh"))
      .filter(size(col("sh")) > 0)
    val sig = withSh.withColumn("sig", minhashSignature(col("sh"), bands * rows))
    val banded = sig
      .select(col("id"), col("sh"),
        explode(bandKeys(col("sig"), bands, rows)).as("bk"))
      .select(col("id"), col("sh"), col("bk.band"), col("bk.bh"))
    // bucket-local pair generation; dedupe candidate pairs across bands
    val buckets = banded
      .groupBy(col("band"), col("bh"))
      .agg(collect_list(struct(col("id"), col("sh"))).as("docs"))
      .filter(size(col("docs")).between(2, maxBucket))
    val candidates = buckets
      .select(explode(expr(
        """filter(
          |  flatten(transform(docs, (a, i) ->
          |    transform(slice(docs, i + 2, size(docs)), b ->
          |      struct(least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b,
          |             a.sh AS sh_a, b.sh AS sh_b)))),
          |  p -> p.id_a != p.id_b)""".stripMargin)).as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.sh_a"), col("p.sh_b"))
      .dropDuplicates("id_a", "id_b")
    candidates
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

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

  /** 64-bit SimHash over token hashes: bit b of the signature is the
    * sign of Σ_tokens (±1 by bit b of xxhash64(token)). Expressed as a
    * per-row SQL fold — no shuffle, no UDF. (SQL `>>`/`&` accept column
    * shift amounts; the Scala wrappers don't.) */
  def simhash(textCol: String): Column = expr(
    s"""aggregate(
       |  transform(sequence(0, 63), b ->
       |    if(aggregate(split($textCol, ' '), 0,
       |         (acc, t) -> acc + if((shiftright(xxhash64(t), b) & 1) = 1, 1, -1)) > 0,
       |       shiftleft(1L, b), 0L)),
       |  0L, (acc, x) -> acc + x)""".stripMargin)

  /** SimHash near-dup pairs with hamming distance ≤ maxDist, using
    * 4-chunk banding (pigeonhole: ≤3 differing bits ⇒ at least one
    * 16-bit chunk identical). Candidate buckets shuffle on the chunk
    * value; verification is bit_count(xor). */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3, maxBucket: Int = 1000): DataFrame = {
    require(maxDist <= 3, "4-chunk banding guarantees recall only for maxDist <= 3")
    val sigs = df.select(col(idCol).as("id"), simhash(textCol).as("sig"))
    val banded = sigs.select(col("id"), col("sig"),
      explode(expr(
        """transform(sequence(0, 3), c ->
          |  struct(c AS chunk, shiftright(sig, c * 16) & 65535 AS ck))""".stripMargin))
        .as("b"))
      .select(col("id"), col("sig"), col("b.chunk"), col("b.ck"))
    val buckets = banded.groupBy(col("chunk"), col("ck"))
      .agg(collect_list(struct(col("id"), col("sig"))).as("docs"))
      .filter(size(col("docs")).between(2, maxBucket))
    buckets
      .select(explode(expr(
        """filter(
          |  flatten(transform(docs, (a, i) ->
          |    transform(slice(docs, i + 2, size(docs)), b ->
          |      struct(least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b,
          |             a.sig AS sig_a, b.sig AS sig_b)))),
          |  p -> p.id_a != p.id_b)""".stripMargin)).as("p"))
      .select(col("p.id_a"), col("p.id_b"),
        bit_count(col("p.sig_a").bitwiseXOR(col("p.sig_b"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxDist)
  }
}
