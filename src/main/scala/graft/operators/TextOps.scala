package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization
  * metrics, quality scoring, language-ID heuristics, fingerprinting.
  *
  * Everything is built from codegen'd `org.apache.spark.sql.functions`
  * (no UDFs): at 100 TB these run inside whole-stage codegen directly
  * over the parquet scan, shuffle-free (all per-row).
  */
object TextOps {

  /** Whitespace tokens of a single-space-separated text column. */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text)))

  /** Adjacent token bigrams as "w1 w2" strings (empty array for a
    * single-token document). Packing the pair into one space-joined
    * string lets every unigram operator (counting groupBy, broadcast
    * score tables) run unchanged over bigrams. */
  def bigrams(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks)
    zip_with(slice(toks, lit(1), greatest(n - lit(1), lit(0))),
      slice(toks, lit(2), greatest(n - lit(1), lit(0))),
      (a, b) => concat(a, lit(" "), b))
  }

  def bigramCount(text: Column): Column = greatest(tokenCount(text) - lit(1), lit(0))

  /** BPE-ish subword piece count: each word contributes
    * ceil(len/4) pieces — a cheap, deterministic stand-in for a real
    * BPE vocab that preserves the "long words cost more tokens" shape. */
  def subtokenCount(text: Column): Column =
    aggregate(
      transform(tokens(text), t => ((length(t) + lit(3)) / lit(4)).cast("int")),
      lit(0), (acc, x) => acc + x)

  /** Average token length over the document (double). */
  def avgTokenLength(text: Column): Column =
    aggregate(transform(tokens(text), t => length(t)), lit(0),
      (acc, x) => acc + x).cast("double") / tokenCount(text)

  private val stopwords = Seq("the", "a", "and", "of", "to", "in", "is")

  /** Count of stopword tokens (quality signal: too few ⇒ keyword spam,
    * too many ⇒ boilerplate). */
  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isin(stopwords.map(lit(_)): _*)))

  def stopwordRatio(text: Column): Column =
    stopwordCount(text).cast("double") / tokenCount(text)

  /** Composite quality score in [0,1]: length band + stopword band +
    * lexical diversity, equally weighted. Deterministic integer/double
    * arithmetic only, so it is exactly reproducible in any engine. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text)
    val lengthOk = when(nTok.between(20, 200), 1.0).otherwise(0.0)
    val stopOk = when(stopwordRatio(text).between(0.01, 0.5), 1.0).otherwise(0.0)
    val diversity = distinctTokenCount(text).cast("double") / nTok
    (lengthOk + stopOk + diversity) / lit(3.0)
  }

  /** Per-language marker words for the n-gram/stopword language-ID
    * heuristic. Real pipelines plug fastText-style models in at the
    * same call site; the heuristic keeps this fully in codegen. */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "nicht", "das"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "que", "una", "por"))

  def langScore(text: Column, lang: String): Column = {
    val markers = langMarkers.toMap.apply(lang)
    size(filter(tokens(text), t => t.isin(markers.map(lit(_)): _*)))
  }

  /** Predicted language = argmax marker count, ties broken by the
    * fixed language order, 'und' when no marker hits. */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (l, _) => (l, langScore(text, l)) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.foldRight(lit("und")) { case ((l, s), els) =>
      when(s === best && best > 0, lit(l)).otherwise(els)
    }
    pick
  }

  /** GPT-2-style pre-tokenizer pattern (contractions, space-prefixed
    * letter runs, digit runs, punctuation runs) restricted to plain
    * alternation + ASCII classes so Java regex (Spark) and RE2 (DuckDB
    * oracle) agree symbol-for-symbol. */
  val BpeTokenPattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9]+"

  /** BPE-ish subword count: matches of [[BpeTokenPattern]] — the
    * pre-tokenization granularity an LLM training pipeline budgets by,
    * as opposed to [[tokenCount]]'s whitespace words and
    * [[subtokenCount]]'s length-based estimate. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0)))

  /** Rolling (Rabin-Karp) polynomial fingerprint over unicode
    * codepoints — engine-independent, SQL-reproducible (the p12 gate
    * oracles it exactly in DuckDB). Complements [[fingerprint]]'s md5:
    * the rolling form extends to windowed/chunk fingerprinting. */
  def rollingFingerprint(text: Column): Column =
    graft.functions.native.poly_fingerprint(text)

  /** Content fingerprint: md5 of the normalized text (lowercase,
    * collapsed whitespace) — the exact-dedup key. */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  /** Unicode-robust content fingerprint: NFC-normalize BEFORE the
    * [[fingerprint]] normalization. Byte-level fingerprints hash a
    * precomposed "é" (U+00E9) and its decomposed twin (e + U+0301)
    * apart, so a re-crawl that round-tripped through a different
    * normalization form survives every exact-dedup pass; NFC folds the
    * composition drift the way whitespace collapse folds formatting
    * drift. Per-row, shuffle-free; the NFC step is the quick-check
    * scan in the (overwhelming) already-normalized case. */
  def nfcFingerprint(text: Column): Column =
    md5(lower(regexp_replace(
      graft.functions.native.nfc_normalize(text), "\\s+", " ")))

  // ---- document chunking (RAG / context-window splitting) --------------

  /** Overlapping token-window chunks: windows of `size` tokens moving
    * by `size - overlap`, the standard RAG / context-packing split.
    * Returns an ARRAY of chunk strings — explode it for the flat
    * (doc, chunk_idx, chunk) table. Pure integer arithmetic + array
    * slicing, per-row and shuffle-free; chunk COUNT uses the exact
    * integer ceil form so any engine reproduces the boundaries. */
  def chunkTokens(text: Column, size: Int, overlap: Int): Column = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    val toks = tokens(text)
    val n = org.apache.spark.sql.functions.size(toks)
    // exact integer ceil((n - size) / stride) + 1, floored at 1
    // (small-int double division + truncating cast == integer floor)
    val nChunks = when(n <= size, lit(1))
      .otherwise(((n - size + stride - 1) / lit(stride)).cast("int") + 1)
    transform(sequence(lit(0), nChunks - 1),
      c => array_join(slice(toks, c * stride + lit(1), lit(size)), " "))
  }

  // ---- repetition signals (Gopher-style quality rules) -----------------

  /** Fraction of n-gram OCCURRENCES that are repeats of an earlier
    * n-gram in the same document: 1 - distinct/total. The word-level
    * form of Gopher's "fraction of characters in duplicate n-grams" —
    * high values flag boilerplate/spam. Per-row, shuffle-free
    * (distinct counting rides the native [[graft.functions.ShingleSet]]
    * expression). */
  def dupNgramFraction(text: Column, n: Int): Column = {
    val total = (tokenCount(text) - lit(n - 1)).cast("double")
    // Documents shorter than n tokens have zero n-grams: define the
    // fraction as 0.0 rather than NULL (Spark div-by-zero) or a value
    // outside [0,1] from a negative denominator. NULL text stays NULL —
    // a missing document must not score as best-quality 0.0 and sail
    // through repetition filters.
    when(total > 0,
      lit(1.0) - size(graft.functions.native.shingle_set(tokens(text), n))
        .cast("double") / total)
      .otherwise(when(total.isNotNull, lit(0.0)))
  }

  /** Occurrence count of the document's most frequent n-gram (native
    * [[graft.functions.MaxNgramFreq]]: one hash-map pass per row — a
    * per-document statistic must not cost a corpus-wide shuffle). */
  def topNgramFreq(text: Column, n: Int): Column =
    graft.functions.native.max_ngram_freq(tokens(text), n)

  /** Fraction of n-gram occurrences taken by the single most frequent
    * n-gram — Gopher's "top n-gram fraction". */
  def topNgramFraction(text: Column, n: Int): Column = {
    val total = (tokenCount(text) - lit(n - 1)).cast("double")
    when(total > 0, topNgramFreq(text, n).cast("double") / total)
      .otherwise(when(total.isNotNull, lit(0.0)))
  }

  // ---- PII detection / redaction ---------------------------------------

  /** Regex patterns restricted to plain alternation/classes/counted
    * repeats so Java regex (Spark) and RE2 (DuckDB oracle) agree
    * symbol-for-symbol (same constraint as [[BpeTokenPattern]]). */
  val EmailPattern: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
  val PhonePattern: String = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val Ipv4Pattern: String =
    "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Redact emails, then phone numbers, then IPv4 addresses (order
    * matters: an email's domain must not be half-eaten by the IP rule).
    * Pure regexp_replace chain — per-row codegen, shuffle-free. */
  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val noPhone = regexp_replace(noEmail, PhonePattern, "<PHONE>")
    regexp_replace(noPhone, Ipv4Pattern, "<IP>")
  }
}
