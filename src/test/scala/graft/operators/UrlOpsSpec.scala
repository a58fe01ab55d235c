package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** URL/domain hygiene operators (p49/p50) and the unicode-robust
  * dedup fingerprint (p53). */
class UrlOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("domainSuffixes expands most-specific-first, >= 2 labels only") {
    import spark.implicits._
    val out = Seq("cdn.assets.example.com", "example.com", "localhost")
      .toDF("h")
      .select(UrlOps.domainSuffixes(col("h")).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("cdn.assets.example.com", "assets.example.com",
      "example.com"))
    assert(out(1) == Seq("example.com"))
    assert(out(2) == Seq.empty) // single label: no registrable suffix
  }

  test("blocklist screen blocks subdomains and reports the tightest rule") {
    import spark.implicits._
    val hosts = Seq(
      (1L, "www.bad.com"),          // suffix match on bad.com
      (2L, "bad.com"),              // exact match
      (3L, "cdn.assets.bad.com"),   // deep subdomain
      (4L, "notbad.com"),           // NOT a suffix match (label boundary)
      (5L, "tracker.bad.com"),      // tighter rule exists -> report it
      (6L, "good.org")).toDF("id", "host")
    val out = UrlOps.domainBlocklistScreen(hosts, "host",
        Seq("bad.com", "tracker.bad.com"))
      .collect().map(r => r.getLong(0) -> (r.getBoolean(3), r.getString(2)))
      .toMap
    assert(out(1L) == (true, "bad.com"))
    assert(out(2L) == (true, "bad.com"))
    assert(out(3L) == (true, "bad.com"))
    assert(out(4L)._1 == false && out(4L)._2 == null)
    assert(out(5L) == (true, "tracker.bad.com")) // most specific wins
    assert(out(6L)._1 == false)
  }

  test("canonicalizeUrl collapses scheme/port/tracking/fragment variants") {
    import spark.implicits._
    val variants = Seq(
      "HTTPS://WWW.Example.COM:443/Path/One?utm_source=x&id=7#frag",
      "https://www.example.com/Path/One?id=7",
      "https://www.example.com:443/Path/One?id=7&utm_campaign=y",
      "https://www.example.com/Path/One?ref=abc&id=7#sec")
    val canon = variants.toDF("u")
      .select(UrlOps.canonicalizeUrl(col("u")).as("c"))
      .collect().map(_.getString(0)).distinct
    assert(canon.toSeq == Seq("https://www.example.com/Path/One?id=7"))
    // path case preserved; tracking-only query drops entirely
    val edge = Seq(
      "http://Host.COM:80/",
      "https://host.com/p/?utm_source=only").toDF("u")
      .select(UrlOps.canonicalizeUrl(col("u")).as("c"))
      .collect().map(_.getString(0))
    assert(edge(0) == "http://host.com")
    assert(edge(1) == "https://host.com/p")
  }

  test("urlDedup keeps the lowest id and counts variants") {
    import spark.implicits._
    val df = Seq(
      (10L, "https://a.com/x?utm_source=1"),
      (7L, "HTTPS://A.COM/x"),
      (3L, "https://b.com/y")).toDF("id", "url")
    val out = UrlOps.urlDedup(df, "id", "url")
      .orderBy(col("canonical_url"))
      .collect()
    assert(out.length == 2)
    assert(out(0).getString(0) == "https://a.com/x" &&
      out(0).getLong(1) == 7L && out(0).getLong(2) == 2L &&
      out(0).getSeq[Long](3) == Seq(7L, 10L))
    assert(out(1).getString(0) == "https://b.com/y" &&
      out(1).getLong(2) == 1L)
  }

  test("nfcFingerprint unifies composed/decomposed/case variants; " +
    "raw fingerprint does not") {
    import spark.implicits._
    val composed = "café résumé"
    val decomposed = "café résumé"
    val upperComposed = "CAFÉ RÉSUMÉ"
    val df = Seq((1L, composed), (2L, decomposed), (3L, upperComposed))
      .toDF("id", "text")
      .select(col("id"), TextOps.nfcFingerprint(col("text")).as("norm"),
        TextOps.fingerprint(col("text")).as("raw"))
    val rows = df.collect().map(r => r.getLong(0) ->
      (r.getString(1), r.getString(2))).toMap
    assert(rows(1L)._1 == rows(2L)._1 && rows(2L)._1 == rows(3L)._1)
    assert(rows(1L)._2 != rows(2L)._2) // byte-level dedup misses these
  }

  test("unicodeDedupGroups reports groups, keepers, and raw_match flags") {
    import spark.implicits._
    val df = Seq(
      (1L, "café latte"),     // composed
      (2L, "café latte"),    // decomposed twin of 1
      (3L, "café latte"),     // byte-identical to 1
      (4L, "espresso")).toDF("id", "text")
    val out = DedupOps.unicodeDedupGroups(df, "id", "text")
      .orderBy(col("id")).collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L))
    assert(out.forall(_.getLong(1) == 1L)) // keeper = min id
    assert(out.forall(_.getLong(3) == 3L)) // group size
    val rawMatch = out.map(r => r.getLong(2) -> r.getBoolean(4)).toMap
    assert(rawMatch(1L) && rawMatch(3L)) // byte-identical to the keeper
    assert(!rawMatch(2L)) // the one exact dedup would have missed
  }
}
