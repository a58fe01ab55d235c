package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.sources._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzzer for the dialect SQL generator: random filter
  * trees from the `sources.Filter` algebra (plus sort/limit/offset)
  * are compiled through `DerbyDialect.rewriteQuery` and executed on a
  * live Derby table; results must equal an in-test reference evaluator
  * implementing SQL three-valued logic. Catches SQL-generation edge
  * cases (parenthesization, NULL semantics, LIKE escaping, OFFSET
  * composition) that example-based specs miss. */
class DialectFuzzSpec extends AnyFunSuite {

  private val rows: Seq[(Int, Option[String])] = Seq(
    1 -> Some("apple"), 2 -> Some("banana"), 3 -> None,
    4 -> Some("apricot"), 5 -> Some("a%b_c"), 6 -> Some("o'neil"),
    7 -> Some(""), 8 -> Some("APPLE"))

  private lazy val url = {
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    val u = s"jdbc:derby:memory:fuzz_${System.nanoTime()};create=true"
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

  // ---- generators ---------------------------------------------------------

  private val genStr: Gen[String] = Gen.oneOf(
    "apple", "ap", "a%b_c", "o'neil", "", "zzz", "%", "_", "'", "APPLE")

  private def leaf: Gen[Filter] = Gen.oneOf(
    Gen.chooseNum(0, 9).map(n => EqualTo("ID", n)),
    Gen.chooseNum(0, 9).map(n => GreaterThan("ID", n)),
    Gen.chooseNum(0, 9).map(n => LessThan("ID", n)),
    Gen.chooseNum(0, 9).map(n => GreaterThanOrEqual("ID", n)),
    Gen.listOfN(3, Gen.chooseNum(0, 9)).map(ns =>
      In("ID", ns.map(_.asInstanceOf[Any]).toArray)),
    Gen.const(IsNull("S")),
    Gen.const(IsNotNull("S")),
    genStr.map(s => EqualTo("S", s)),
    genStr.map(s => EqualNullSafe("S", s)),
    genStr.map(s => StringStartsWith("S", s)),
    genStr.map(s => StringEndsWith("S", s)),
    genStr.map(s => StringContains("S", s)))

  private def genFilter(depth: Int): Gen[Filter] =
    if (depth <= 0) leaf
    else Gen.frequency(
      4 -> leaf,
      2 -> Gen.zip(genFilter(depth - 1), genFilter(depth - 1))
        .map { case (a, b) => And(a, b) },
      2 -> Gen.zip(genFilter(depth - 1), genFilter(depth - 1))
        .map { case (a, b) => Or(a, b) },
      1 -> genFilter(depth - 1).map(Not))

  // ---- reference evaluator: SQL three-valued logic -------------------------

  private def eval(f: Filter, id: Int, s: Option[String]): Option[Boolean] =
    f match {
      case EqualTo("ID", v) => Some(id == v.asInstanceOf[Int])
      case GreaterThan("ID", v) => Some(id > v.asInstanceOf[Int])
      case GreaterThanOrEqual("ID", v) => Some(id >= v.asInstanceOf[Int])
      case LessThan("ID", v) => Some(id < v.asInstanceOf[Int])
      case In("ID", vs) => Some(vs.contains(id))
      case IsNull("S") => Some(s.isEmpty)
      case IsNotNull("S") => Some(s.nonEmpty)
      case EqualTo("S", v) => s.map(_ == v.asInstanceOf[String])
      case EqualNullSafe("S", v) => Some(s.contains(v.asInstanceOf[String]))
      case StringStartsWith("S", p) => s.map(_.startsWith(p))
      case StringEndsWith("S", p) => s.map(_.endsWith(p))
      case StringContains("S", p) => s.map(_.contains(p))
      case And(a, b) => (eval(a, id, s), eval(b, id, s)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
      case Or(a, b) => (eval(a, id, s), eval(b, id, s)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
      case Not(a) => eval(a, id, s).map(!_)
      case other => fail(s"evaluator missing case: $other")
    }

  private def forAllG[A](gen: Gen[A], n: Int)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = Seed(0xD1A1EC7L)
    var i = 0
    while (i < n) {
      gen.apply(params, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  test("rewriteQuery(filters) matches three-valued-logic reference semantics") {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      forAllG(genFilter(2), n = 250) { f =>
        DerbyDialect.compileFilter(f).foreach { sql =>
          val q = DerbyDialect.rewriteQuery(
            RemoteSource.TableRef(Seq("T")), Seq(sql), None, Some(Seq("ID")))
          val rs = st.executeQuery(q)
          val got = Iterator.continually(rs)
            .takeWhile(_.next()).map(_.getInt(1)).toSet
          rs.close()
          val want = rows.collect {
            case (id, s) if eval(f, id, s).contains(true) => id
          }.toSet
          assert(got == want, s"filter $f\nsql $q\ngot $got want $want")
        }
      }
      st.close()
    } finally conn.close()
  }

  test("sort + limit + offset compose over fuzzed filters") {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      val gen = for {
        f <- genFilter(1)
        desc <- Gen.oneOf(true, false)
        limit <- Gen.chooseNum(1, 6)
        offset <- Gen.oneOf(None, Some(1), Some(3))
      } yield (f, desc, limit, offset)
      forAllG(gen, n = 120) { case (f, desc, limit, offset) =>
        DerbyDialect.compileFilter(f).foreach { sql =>
          val q = DerbyDialect.rewriteQuery(
            RemoteSource.TableRef(Seq("T")), Seq(sql), Some(limit),
            Some(Seq("ID")),
            Seq(DerbyDialect.sortClause("ID", desc, nullsFirst = false)),
            offset)
          val rs = st.executeQuery(q)
          val got = Iterator.continually(rs)
            .takeWhile(_.next()).map(_.getInt(1)).toSeq
          rs.close()
          val filtered = rows.collect {
            case (id, s) if eval(f, id, s).contains(true) => id
          }
          val ordered = if (desc) filtered.sorted.reverse else filtered.sorted
          val want = ordered.drop(offset.getOrElse(0)).take(limit)
          assert(got == want,
            s"filter $f desc=$desc limit=$limit offset=$offset\nsql $q\n" +
              s"got $got want $want")
        }
      }
      st.close()
    } finally conn.close()
  }
}
