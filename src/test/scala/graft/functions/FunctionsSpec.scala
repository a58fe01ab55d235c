package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("native functions are callable from SQL after registration") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT simhash64(split('a b c', ' ')) AS sh,
        | dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp,
        | size(minhash_sig(array('x', 'y'), 16)) AS k,
        | size(shingle_set(split('a b c d', ' '), 2)) AS ns
        |""".stripMargin).collect().head
    assert(row.getAs[Double]("dp") == 11.0)
    assert(row.getAs[Int]("k") == 16)
    assert(row.getAs[Int]("ns") == 3)
    // SQL result equals the Column-API result (same expression class)
    val viaApi = spark.range(1)
      .select(native.simhash64(split(lit("a b c"), " ")).as("sh"))
      .collect().head.getLong(0)
    assert(row.getAs[Long]("sh") == viaApi)
  }

  test("gram_fps_wide: f1 is bit-identical to gram_fps (same first two " +
      "poly families), f2 is an independent pack, positions align") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val row = spark.range(1)
      .select(
        native.gram_fps(lit(text), 3).as("narrow"),
        native.gram_fps_wide(lit(text), 3).as("wide"))
      .collect().head
    val narrow = row.getSeq[Long](0)
    val wide = row.getSeq[org.apache.spark.sql.Row](1)
    assert(narrow.nonEmpty && narrow.length == wide.length)
    narrow.indices.foreach { i =>
      assert(wide(i).getLong(0) == narrow(i),
        s"window $i: wide.f1 ${wide(i).getLong(0)} != narrow ${narrow(i)}")
      // both packs are h·M + h' with h,h' < 2^31−1 → strictly < 2^62
      assert(wide(i).getLong(0) >= 0 && wide(i).getLong(1) >= 0)
    }
    // the second family is genuinely independent: equal-f1 windows
    // (here: the two identical "again"-anchored windows don't exist,
    // so just pin f2 != f1 for at least one window — families differ)
    assert(wide.exists(r => r.getLong(0) != r.getLong(1)))
  }

  test("set-backed functions are callable from SQL with array literals") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT
        | in_set_count(split('a b c b', ' '), array('b', 'z')) AS n_in,
        | token_score_sum(split('a b q', ' '),
        |   array('a', 'b'), array(0.25, 0.5), 0.125D) AS score,
        | simhash_poly(split('x y', ' ')) AS sp,
        | max_ngram_freq(split('a b a b a', ' '), 2) AS mf
        |""".stripMargin).collect().head
    assert(row.getAs[Int]("n_in") == 2)
    assert(row.getAs[Double]("score") == 0.25 + 0.5 + 0.125)
    assert(row.getAs[Int]("mf") == 2)
    val viaApi = spark.range(1)
      .select(native.simhash_poly(split(lit("x y"), " ")))
      .collect().head.getLong(0)
    assert(row.getAs[Long]("sp") == viaApi)
    // decimal-literal value arrays work too
    val dec = spark.sql(
      """SELECT token_score_sum(array('k'), array('k'), array(0.5)) AS s"""
    ).collect().head.getDouble(0)
    assert(dec == 0.5)
  }

  test("poly fingerprint matches the reference recurrence incl. astral chars") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def ref(s: String): Long = {
      var h = 0L
      s.codePoints().forEach(cp => h = (h * 31 + cp) % 2147483647L)
      h
    }
    val inputs = Seq("", "hello", "the quick brown fox",
      "astral 😀 char") // U+1F600 is one codepoint, two chars
    val got = inputs.toDF("t")
      .select(graft.functions.native.poly_fingerprint(col("t")))
      .as[Long].collect().toSeq
    assert(got == inputs.map(ref))
  }

  test("multi_contains == per-pattern contains, incl. overlapping " +
      "patterns and failure-link outputs") {
    import spark.implicits._
    val pats = Seq("slow filter", "filter", "slow", "owl", "never here")
    val texts = Seq(
      (1L, "a slow filter runs"),       // matches slow filter, filter, slow
      (2L, "slowly filtered"),          // slow, filter (substrings)
      (3L, "an owl flew"),              // owl
      (4L, "sl ow fil ter"),            // nothing
      (5L, ""),                         // empty text
      (6L, "slow slow slow"))           // slow once (distinct)
    val got = texts.toDF("id", "t")
      .select(col("id"),
        array_join(native.multi_contains(col("t"), pats), "|").as("m"))
      .as[(Long, String)].collect().toMap
    def naive(t: String) = pats.filter(t.contains).mkString("|")
    texts.foreach { case (id, t) => assert(got(id) == naive(t), s"id=$id") }
  }

  test("multi_contains: null text yields null; non-ASCII patterns match " +
      "byte-exactly") {
    import spark.implicits._
    val pats = Seq("héllo", "wörld")
    val got = Seq((1L, Some("héllo wörld")), (2L, None))
      .toDF("id", "t")
      .select(col("id"), native.multi_contains(col("t"), pats).as("m"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getSeq[String](1).toList)))
      .toMap
    assert(got(1L).contains(pats.toList))
    assert(got(2L).isEmpty)
  }

  test("range join bucketed == naive inequality join") {
    import spark.implicits._
    val points = Seq((1L, 5.0), (2L, 42.0), (3L, 99.0), (4L, 150.0))
      .toDF("pid", "v")
    val ivs = Seq((10L, 0L, 50L), (20L, 40L, 100L), (30L, 120L, 130L))
      .toDF("iid", "lo", "hi")
    val got = graft.operators.RangeJoin
      .pointInInterval(points, "v", ivs, "lo", "hi", bucketWidth = 16L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(ivs, $"v" >= $"lo" && $"v" < $"hi")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive && got.contains((2L, 10L)) && got.contains((2L, 20L)))
    assert(!got.exists(_._1 == 4L)) // 150 in no interval
  }
}
