package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks of the native expressions (pure JVM — no
  * Spark session: ArrayData in, value out) and of dialect SQL escaping
  * against a live Derby parser. Uses raw ScalaCheck `Gen` with a fixed
  * seed schedule (the scalatestplus bridge is not in the offline
  * cache), so failures reproduce deterministically. */
class PropertySpec extends AnyFunSuite {

  /** Deterministic mini-forAll: n samples from gen, fixed seed walk. */
  private def forAllG[A](gen: Gen[A], n: Int = 120)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default.withSize(24)
    var seed = Seed(0x5EEDL)
    var i = 0
    while (i < n) {
      gen.apply(params, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private def arr(tokens: Seq[String]): ArrayData =
    new GenericArrayData(tokens.map(UTF8String.fromString).toArray[Any])
  private def longArr(xs: Seq[Long]): ArrayData =
    new GenericArrayData(xs.toArray)

  private val token: Gen[String] =
    Gen.chooseNum(0, 8).flatMap(n => Gen.stringOfN(n, Gen.asciiPrintableChar))
  private val tokens: Gen[List[String]] = Gen.listOf(token)
  // full unicode incl. astral plane (codepoint-loop coverage)
  private val uniToken: Gen[String] = Gen.listOf(Gen.frequency(
    8 -> Gen.asciiPrintableChar.map(_.toString),
    1 -> Gen.oneOf("é", "λ", "中", "🙂", "𝕏"))).map(_.mkString)

  test("MultiContains (Aho-Corasick) == naive per-pattern contains on " +
      "any text, incl. overlapping and nested patterns") {
    // low-entropy alphabet so patterns overlap, nest, and share
    // prefixes/suffixes often — the failure-link stress shape
    val abToken: Gen[String] =
      Gen.chooseNum(1, 6).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b')))
    val case_ = for {
      nPats <- Gen.chooseNum(1, 8)
      pats <- Gen.listOfN(nPats, abToken)
      text <- Gen.chooseNum(0, 40)
        .flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))
    } yield (pats.distinct, text)
    forAllG(case_, n = 200) { case (pats, text) =>
      if (pats.nonEmpty) {
        val e = MultiContains(Literal(UTF8String.fromString(text)), pats)
        val got = e.nullSafeEval(UTF8String.fromString(text))
          .asInstanceOf[ArrayData]
        val gotSeq = (0 until got.numElements())
          .map(i => got.getUTF8String(i).toString)
        assert(gotSeq == pats.filter(text.contains(_)),
          s"pats=$pats text=$text")
      }
    }
  }

  test("SimHashPoly equals the codepoint-recurrence reference on any tokens") {
    def poly(s: String, base: Long, mod: Long): Long =
      s.codePoints().toArray.foldLeft(0L)((h, cp) => (h * base + cp) % mod)
    def fmix31(x0: Long): Long = {
      var x = x0 & 0xFFFFFFFFL
      x ^= x >>> 16; x = (x * 0x85ebca6bL) & 0xFFFFFFFFL
      x ^= x >>> 13; x = (x * 0xc2b2ae35L) & 0xFFFFFFFFL
      x ^= x >>> 16; x & 0x7FFFFFFFL
    }
    def ref(ts: Seq[String]): Long = {
      val counts = new Array[Int](62)
      ts.foreach { t =>
        val h = fmix31(poly(t, 31, 2147483647L)) |
          (fmix31(poly(t, 37, 2147483629L)) << 31)
        (0 until 62).foreach(b =>
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1)
      }
      (0 until 62).foldLeft(0L)((s, b) => if (counts(b) > 0) s | (1L << b) else s)
    }
    val e = SimHashPoly(Literal(1))
    forAllG(Gen.listOf(uniToken)) { ts =>
      assert(e.nullSafeEval(arr(ts)) == ref(ts))
    }
  }

  test("MinHash signatures are order- and duplication-insensitive") {
    val sig = MinHashSig(Literal(1), 16)
    forAllG(Gen.zip(tokens, Gen.long)) { case (ts, seed) =>
      if (ts.nonEmpty) {
        val shuffled = new scala.util.Random(seed).shuffle(ts)
        val a = sig.nullSafeEval(arr(ts.distinct))
          .asInstanceOf[ArrayData].toLongArray
        val b = sig.nullSafeEval(arr(shuffled ++ ts.take(1)))
          .asInstanceOf[ArrayData].toLongArray
        assert(a.sameElements(b),
          "minima must not depend on order or multiplicity")
      }
    }
  }

  test("SortedPairs emits exactly the distinct-value unordered pairs") {
    val e = SortedPairs(Literal(1))
    forAllG(Gen.listOf(Gen.chooseNum(-5L, 5L))) { ids =>
      val got = e.nullSafeEval(longArr(ids)).asInstanceOf[ArrayData]
      val pairs = (0 until got.numElements()).map { i =>
        val r = got.getStruct(i, 2); (r.getLong(0), r.getLong(1))
      }
      val want = for {
        i <- ids.indices; j <- (i + 1) until ids.size
        if ids(i) != ids(j)
      } yield (math.min(ids(i), ids(j)), math.max(ids(i), ids(j)))
      assert(pairs.sorted == want.sorted)
      assert(pairs.forall { case (a, b) => a < b })
    }
  }

  test("MaxNgramFreq equals the naive counter") {
    forAllG(Gen.zip(tokens, Gen.chooseNum(1, 4))) { case (ts, n) =>
      val e = MaxNgramFreq(Literal(1), n)
      val got = e.nullSafeEval(arr(ts)).asInstanceOf[Integer].intValue()
      val grams = ts.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
      val want = if (grams.isEmpty) 0
        else grams.groupBy(identity).values.map(_.size).max
      assert(got == want)
    }
  }

  test("InSetCount equals the naive membership count") {
    forAllG(Gen.zip(tokens, tokens)) { case (ts, set) =>
      val e = InSetCount(Literal(1), set)
      val got = e.nullSafeEval(arr(ts)).asInstanceOf[Integer].intValue()
      assert(got == ts.count(set.toSet))
    }
  }

  test("TokenScoreSum equals the left-to-right fold bit-for-bit") {
    val entry = for {
      k <- token; v <- Gen.chooseNum(-1000, 1000).map(_ / 64.0)
    } yield (k, v)
    forAllG(Gen.zip(tokens, Gen.listOf(entry))) { case (ts, es) =>
      val table = es.toMap
      val e = TokenScoreSum(Literal(1), table.toSeq, default = 0.25)
      val got = e.nullSafeEval(arr(ts)).asInstanceOf[java.lang.Double]
      val want = ts.foldLeft(0.0)((acc, t) => acc + table.getOrElse(t, 0.25))
      assert(got == want)
    }
  }

  test("PolyFingerprint never leaves [0, mod) and matches the recurrence") {
    val e = PolyFingerprint(Literal(1), base = 31L, mod = 2147483647L)
    forAllG(uniToken) { s =>
      val got = e.nullSafeEval(UTF8String.fromString(s))
        .asInstanceOf[java.lang.Long].longValue()
      val want = s.codePoints().toArray
        .foldLeft(0L)((h, cp) => (h * 31 + cp) % 2147483647L)
      assert(got == want && got >= 0 && got < 2147483647L)
    }
  }

  test("dialect string literals survive a real SQL parser (injection-safe)") {
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    val url = s"jdbc:derby:memory:proplit_${System.nanoTime()};create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      // Derby rejects NUL in literals; everything else must round-trip
      val nasty = Gen.listOf(Gen.frequency(
        6 -> Gen.asciiPrintableChar.map(_.toString),
        2 -> Gen.oneOf("'", "''", "\"", "\\", "--", ";", "%", "_"),
        1 -> Gen.oneOf("é", "中", "🙂"))).map(_.mkString)
      forAllG(nasty, n = 60) { s =>
        val lit = graft.sources.DerbyDialect.stringLiteral(s)
        val rs = st.executeQuery(s"SELECT $lit FROM SYSIBM.SYSDUMMY1")
        rs.next()
        // Derby returns '' literal as a zero-length string; both sides
        // compare as Java strings
        assert(rs.getString(1) == s, s"literal did not round-trip: $lit")
        rs.close()
      }
      // quoted identifiers parse and keep their exact name
      val ident = Gen.listOf(Gen.frequency(
        6 -> Gen.alphaNumChar.map(_.toString),
        2 -> Gen.oneOf("\"", " ", ".", "-"))).map(_.mkString)
      forAllG(ident, n = 40) { id =>
        if (id.nonEmpty) {
          val q = graft.sources.DerbyDialect.quote(id)
          val rs = st.executeQuery(s"SELECT 1 AS $q FROM SYSIBM.SYSDUMMY1")
          assert(rs.getMetaData.getColumnLabel(1) == id)
          rs.close()
        }
      }
      st.close()
    } finally conn.close()
  }
}
