package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.connector.expressions.{Expression, GeneralScalarExpression}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzzer for the r19 scalar-function pushdown path:
  * random predicate trees over whitelisted scalar functions
  * (CHAR_LENGTH / LOWER / UPPER / SUBSTRING) are compiled through
  * [[ScalarPredicateSQL]] + `DerbyDialect.scalarFn` and executed on a
  * live Derby table; the surviving IDs must equal an in-test reference
  * evaluator implementing SPARK's function semantics under SQL
  * three-valued logic. A divergence here would mean a pushed (Exact,
  * never re-checked) filter silently changes rows — the exact failure
  * mode the whitelist exists to prevent. Complements DialectFuzzSpec,
  * which fuzzes the v1 `sources.Filter` algebra the same way. */
class ScalarFnFuzzSpec extends AnyFunSuite {

  private val rows: Seq[(Int, Option[String])] = Seq(
    1 -> Some("apple"), 2 -> Some("Banana"), 3 -> None,
    4 -> Some("APRICOT"), 5 -> Some("a%b_c"), 6 -> Some("o'neil"),
    7 -> Some(""), 8 -> Some("APPLE"), 9 -> Some("ap"))

  private lazy val url = {
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    val u = s"jdbc:derby:memory:sfuzz_${System.nanoTime()};create=true"
    val c = DriverManager.getConnection(u)
    val st = c.createStatement()
    st.executeUpdate("CREATE TABLE T (ID INT NOT NULL, S VARCHAR(32))")
    val ps = c.prepareStatement("INSERT INTO T VALUES (?, ?)")
    rows.foreach { case (id, s) =>
      ps.setInt(1, id)
      s.fold(ps.setNull(2, java.sql.Types.VARCHAR))(ps.setString(2, _))
      ps.addBatch()
    }
    ps.executeBatch(); ps.close(); st.close(); c.close()
    u
  }

  // ---- predicate model (mirrors what Spark's V2 translation emits) --------

  private sealed trait P
  private case class LenCmp(op: String, n: Int) extends P
  private case class CaseEq(lower: Boolean, v: String) extends P
  private case class SubstrEq(pos: Int, len: Int, v: String) extends P
  private case class AndP(a: P, b: P) extends P
  private case class OrP(a: P, b: P) extends P
  private case class NotP(a: P) extends P

  private val genStr: Gen[String] = Gen.oneOf(
    "apple", "ap", "", "banana", "apricot", "o'neil", "a%b_c", "zzz")

  private def leaf: Gen[P] = Gen.oneOf(
    for { op <- Gen.oneOf("=", ">", "<"); n <- Gen.chooseNum(0, 8) }
      yield LenCmp(op, n),
    for { lo <- Gen.oneOf(true, false); v <- genStr }
      yield CaseEq(lo, if (lo) v.toLowerCase else v.toUpperCase),
    for { pos <- Gen.chooseNum(1, 4); len <- Gen.chooseNum(1, 3); v <- genStr }
      yield SubstrEq(pos, len, v))

  private def genP(depth: Int): Gen[P] =
    if (depth <= 0) leaf
    else Gen.frequency(
      4 -> leaf,
      2 -> Gen.zip(genP(depth - 1), genP(depth - 1)).map(t => AndP(t._1, t._2)),
      2 -> Gen.zip(genP(depth - 1), genP(depth - 1)).map(t => OrP(t._1, t._2)),
      1 -> genP(depth - 1).map(NotP))

  // ---- V2 predicate assembly ----------------------------------------------

  private val sRef = Bridge.v2Column("S")
  private def strLit(v: String) = Bridge.v2Literal(
    org.apache.spark.unsafe.types.UTF8String.fromString(v), StringType)
  private def intLit(n: Int) = Bridge.v2Literal(n, IntegerType)

  private def toV2(p: P): Predicate = p match {
    case LenCmp(op, n) => new Predicate(op, Array[Expression](
      new GeneralScalarExpression("CHAR_LENGTH", Array[Expression](sRef)),
      intLit(n)))
    case CaseEq(lower, v) => new Predicate("=", Array[Expression](
      new GeneralScalarExpression(if (lower) "LOWER" else "UPPER",
        Array[Expression](sRef)),
      strLit(v)))
    case SubstrEq(pos, len, v) => new Predicate("=", Array[Expression](
      new GeneralScalarExpression("SUBSTRING",
        Array[Expression](sRef, intLit(pos), intLit(len))),
      strLit(v)))
    case AndP(a, b) => new Predicate("AND", Array[Expression](toV2(a), toV2(b)))
    case OrP(a, b) => new Predicate("OR", Array[Expression](toV2(a), toV2(b)))
    case NotP(a) => new Predicate("NOT", Array[Expression](toV2(a)))
  }

  // ---- reference evaluator: Spark semantics, three-valued logic -----------

  private def eval(p: P, s: Option[String]): Option[Boolean] = p match {
    case LenCmp(op, n) => s.map(x => op match {
      case "=" => x.length == n
      case ">" => x.length > n
      case "<" => x.length < n
    })
    case CaseEq(lower, v) =>
      s.map(x => (if (lower) x.toLowerCase else x.toUpperCase) == v)
    case SubstrEq(pos, len, v) =>
      s.map(x => x.drop(pos - 1).take(len) == v)
    case AndP(a, b) => (eval(a, s), eval(b, s)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }
    case OrP(a, b) => (eval(a, s), eval(b, s)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }
    case NotP(a) => eval(a, s).map(!_)
  }

  private def forAllG[A](gen: Gen[A], n: Int)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = Seed(0x5CA1A2F7L)
    var i = 0
    while (i < n) {
      gen.apply(params, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  test("ScalarPredicateSQL(Derby) matches Spark fn semantics under 3VL") {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      var compiled = 0
      forAllG(genP(2), n = 250) { p =>
        val sql = new ScalarPredicateSQL(DerbyDialect, c => Some(c))
          .build(toV2(p))
        compiled += 1
        val q = DerbyDialect.rewriteQuery(
          RemoteSource.TableRef(Seq("T")), Seq(sql), None, Some(Seq("ID")))
        val rs = st.executeQuery(q)
        val got = Iterator.continually(rs)
          .takeWhile(_.next()).map(_.getInt(1)).toSet
        rs.close()
        val want = rows.collect {
          case (id, s) if eval(p, s).contains(true) => id
        }.toSet
        assert(got == want, s"pred $p\nsql $q\ngot $got want $want")
      }
      assert(compiled == 250, "every whitelisted tree must compile")
      st.close()
    } finally conn.close()
  }

  test("non-whitelisted functions and casts throw (caller treats as decline)") {
    val b = new ScalarPredicateSQL(DerbyDialect, c => Some(c))
    intercept[IllegalArgumentException] {
      b.build(new Predicate(">", Array[Expression](
        new GeneralScalarExpression("SQRT", Array[Expression](sRef)),
        intLit(1))))
    }
    intercept[IllegalArgumentException] {
      b.build(new Predicate("<=>", Array[Expression](sRef, strLit("x"))))
    }
    // unknown column: rename refuses
    val none = new ScalarPredicateSQL(DerbyDialect, _ => None)
    intercept[IllegalArgumentException] {
      none.build(new Predicate("=", Array[Expression](
        new GeneralScalarExpression("LOWER", Array[Expression](sRef)),
        strLit("x"))))
    }
  }

  test("MDB dialect refuses every scalar function") {
    val b = new ScalarPredicateSQL(MdbDialect, c => Some(c))
    intercept[IllegalArgumentException] {
      b.build(new Predicate("=", Array[Expression](
        new GeneralScalarExpression("LOWER", Array[Expression](sRef)),
        strLit("x"))))
    }
  }
}
