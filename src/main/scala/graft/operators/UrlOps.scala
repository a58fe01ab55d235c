package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain hygiene for web-crawl corpora — the admission screens
  * that run BEFORE text-level curation (a crawl is addressed by URL,
  * and licensing/opt-out/robots decisions are made at the domain
  * level, not the document level).
  *
  * Two operators:
  *   - domain BLOCKLIST screening with registrable-suffix semantics
  *     ("block example.com" must also block cdn.assets.example.com),
  *   - URL CANONICALIZATION + dedup (the same landing page is crawled
  *     as http/https, with/without default port, with tracking params,
  *     with fragments — canonical-URL dedup collapses those BEFORE
  *     any content fetch or text dedup runs).
  *
  * Scale shape: both are per-row column expressions — the suffix
  * expansion is bounded by the host's label count (≤ ~8 for real
  * hosts), the blocklist rides the plan as a literal/broadcast (the
  * production form is a broadcast join against a blocklist table; the
  * semantics here are identical), and the regex chain is RE2-safe
  * (linear-time, no backtracking blow-up on adversarial URLs). The
  * only shuffle in urlDedup is the canonical-key groupBy — the same
  * one exact text dedup pays. Everything whole-stage-codegens; zero
  * driver participation.
  *
  * Engine-independent by construction (split/slice/regex/string ops
  * only — no hash families, no locale-sensitive collation), so DuckDB
  * reproduces every verdict bit-for-bit.
  */
object UrlOps {

  /** All dot-suffixes of a host with >= 2 labels, MOST specific first:
    * "cdn.assets.example.com" -> ["cdn.assets.example.com",
    * "assets.example.com", "example.com"]. Matching most-specific
    * first means the reported rule is the tightest blocklist entry
    * that fired. Single-label hosts ("localhost") have no 2-label
    * suffix and return an empty array. */
  def domainSuffixes(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    when(n >= 2,
      transform(sequence(lit(1), n - 1),
        i => array_join(slice(labels, i, n - i + 1), ".")))
      .otherwise(array().cast("array<string>"))
  }

  /** Blocklist screen: adds `blocked` (any suffix of `hostCol` appears
    * in `blocklist`) and `rule` (the most specific matching entry, or
    * NULL). Keeps every row — the caller filters or routes; an
    * audit-friendly screen reports WHY a host was dropped rather than
    * silently dropping it (the m11 quarantine pattern, one level up
    * the stack). */
  def domainBlocklistScreen(
      df: DataFrame, hostCol: String, blocklist: Seq[String]): DataFrame = {
    require(blocklist.nonEmpty, "empty blocklist: nothing to screen")
    val rules = array(blocklist.map(r => lit(r.toLowerCase)): _*)
    val matched = filter(domainSuffixes(lower(col(hostCol))),
      s => array_contains(rules, s))
    // try_element_at: an unmatched host has an EMPTY match list, which
    // plain element_at rejects under ANSI mode
    df.withColumn("rule", try_element_at(matched, lit(1)))
      .withColumn("blocked", col("rule").isNotNull)
  }

  /** Canonicalize a URL for identity comparison. Deterministic,
    * order-pinned rewrite chain (each step is a single RE2-safe
    * regex, applied globally):
    *   1. drop the fragment (`#...` never reaches the server),
    *   2. lowercase the scheme://host[:port] prefix (case-insensitive
    *      per RFC 3986; the PATH stays case-sensitive),
    *   3. strip default ports :80/:443,
    *   4. remove tracking query params (utm_*, fbclid, gclid, ref)
    *      and repair the separators they leave behind,
    *   5. strip trailing slashes and a dangling `?`/`&`.
    * The same chain in the same order reproduces the same canonical
    * string in any regex-capable engine. */
  def canonicalizeUrl(url: Column): Column = {
    // 1. fragment
    val noFrag = regexp_replace(url, "#.*$", "")
    // 2. lowercase scheme+authority only
    val prefix = regexp_extract(noFrag, "^([^/]*//[^/]*)", 1)
    val rest = regexp_replace(noFrag, "^[^/]*//[^/]*", "")
    val lowered = concat(lower(prefix), rest)
    // 3. default ports (http and https defaults both stripped)
    val noPort = regexp_replace(lowered,
      "^(https?://[^/:]*):(80|443)(/|$)", "$1$3")
    // 4. tracking params + separator repair
    val noTrack = regexp_replace(noPort,
      "([?&])(utm_[^=&]*|fbclid|gclid|ref)=[^&]*", "$1")
    val fixQ = regexp_replace(noTrack, "\\?&+", "?")
    val fixAmp = regexp_replace(fixQ, "&&+", "&")
    // 5. dangling separators / trailing slash
    val noTail = regexp_replace(fixAmp, "[?&]+$", "")
    regexp_replace(noTail, "/+$", "")
  }

  /** Canonical-URL dedup: one row per canonical URL with the keeper
    * (lowest id — "first crawled wins" under monotone crawl ids), the
    * variant count, and the sorted variant id list. The groupBy is on
    * the canonical string — at 100 TB hash-partitioned like any exact
    * dedup; variant_ids is bounded by the per-URL crawl multiplicity
    * (single digits in practice), not the corpus. */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("__id"),
        canonicalizeUrl(col(urlCol)).as("canonical_url"))
      .groupBy(col("canonical_url"))
      .agg(min(col("__id")).as("keeper"),
        count(lit(1)).as("n_variants"),
        array_sort(collect_list(col("__id"))).as("variant_ids"))
}
