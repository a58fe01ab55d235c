package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Regression specs for the round-3 ADVICE findings. */
class Round4FixSpec extends AnyFunSuite {
  private lazy val spark = { DerbyFixture.init; SparkTestSession.spark }

  // ---- WriteFields positional fallback is synthetic-names-only ---------

  private val remote2 = RemoteSchema(Seq(
    RemoteField("a", RemoteType.RInt4),
    RemoteField("b", RemoteType.RVarchar(10))))

  test("positional write fallback fires only for synthetic col1..colN names") {
    val synthetic = StructType(Seq(
      StructField("col1", IntegerType), StructField("col2", StringType)))
    assert(WriteFields.resolve(remote2, synthetic).map(_.name).toSeq ==
      Seq("a", "b"))
    // case-insensitive synthetic names still qualify
    val upper = StructType(Seq(
      StructField("COL1", IntegerType), StructField("COL2", StringType)))
    assert(WriteFields.resolve(remote2, upper).map(_.name).toSeq ==
      Seq("a", "b"))
  }

  test("all-miss with NON-synthetic names is a loud error, not positional") {
    val misnamed = StructType(Seq(
      StructField("x", IntegerType), StructField("y", StringType)))
    intercept[Exception] { WriteFields.resolve(remote2, misnamed) }
    // partial miss stays loud too
    val partial = StructType(Seq(
      StructField("a", IntegerType), StructField("y", StringType)))
    intercept[Exception] { WriteFields.resolve(remote2, partial) }
  }

  // ---- streaming backlog slicing overflow guard ------------------------

  private def streamWith(extra: (String, String)*): RemoteMicroBatchStream = {
    val opts = RemoteOptions(Map(
      "url" -> DerbyFixture.url, "dbtable" -> "NATION",
      "streamingcolumn" -> "ID") ++ extra)
    val rs = RemoteSchema(Seq(
      RemoteField("ID", RemoteType.RInt8, nullable = false)))
    val st = StructType(Seq(StructField("ID", LongType, nullable = false)))
    new RemoteMicroBatchStream(opts, rs, st, st, Nil)
  }

  test("first-batch backlog from default streamingStart is one partition (no overflow wrap)") {
    val s = streamWith("numpartitions" -> "8")
    // lo = Long.MinValue (default start): hi - lo overflows; must take
    // the single-partition branch deliberately, not by wrap accident,
    // and the emitted predicate must be well-formed.
    val parts = s.planInputPartitions(RemoteOffset(Long.MinValue), RemoteOffset(1000L))
    assert(parts.length == 1)
  }

  test("finite streamingstart backlog still slices into numpartitions") {
    val s = streamWith("numpartitions" -> "4", "streamingstart" -> "0")
    val parts = s.planInputPartitions(RemoteOffset(0L), RemoteOffset(1000L))
    assert(parts.length == 4)
  }

  // ---- catalog LIKE-pattern escaping -----------------------------------

  test("tableExists does not treat '_' in identifiers as a LIKE wildcard") {
    val c = DriverManager.getConnection(DerbyFixture.url)
    val st = c.createStatement()
    try st.executeUpdate("CREATE TABLE LIKEXESC (K INT)")
    catch { case _: Exception => () }
    st.close(); c.close()
    import org.apache.spark.sql.connector.catalog.Identifier
    val cat = new GraftCatalog()
    val cco = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("url", DerbyFixture.url))
    cat.initialize("g", cco)
    // LIKE semantics would match LIKEXESC for pattern LIKE_ESC; escaped
    // lookup must say the underscored table does not exist.
    assert(!cat.tableExists(Identifier.of(Array.empty[String], "LIKE_ESC")))
    assert(cat.tableExists(Identifier.of(Array.empty[String], "LIKEXESC")))
  }

  // ---- wide string DDL --------------------------------------------------

  test("catalog CREATE TABLE + append round-trips a >4000-char document") {
    assert(DerbyDialect.ddlType(StringType) == "VARCHAR(32672)")
    assert(PostgresDialect.ddlType(StringType) == "TEXT")
    assert(OracleDialect.ddlType(StringType) == "CLOB")
    val c = DriverManager.getConnection(DerbyFixture.url)
    val st = c.createStatement()
    try st.executeUpdate("DROP TABLE WIDE_DOC") catch { case _: Exception => () }
    st.executeUpdate(
      s"CREATE TABLE WIDE_DOC (ID INT, TXT ${DerbyDialect.ddlType(StringType)})")
    st.close(); c.close()
    val doc = "x" * 20000
    import spark.implicits._
    Seq((1, doc)).toDF("ID", "TXT")
      .write.format("graft-remote")
      .option("url", DerbyFixture.url).option("dbtable", "WIDE_DOC")
      .mode("append").save()
    val back = spark.read.format("graft-remote")
      .option("url", DerbyFixture.url).option("dbtable", "WIDE_DOC")
      .load().collect()
    assert(back.length == 1 && back(0).getString(1) == doc)
  }

  // ---- literal-SQL insert: timestamp edges + binary --------------------

  test("literalinsert round-trips timestamp edge cases and binary exactly") {
    val c = DriverManager.getConnection(DerbyFixture.url)
    val st = c.createStatement()
    try st.executeUpdate("DROP TABLE LITEDGE") catch { case _: Exception => () }
    st.executeUpdate(
      "CREATE TABLE LITEDGE (K INT, TS TIMESTAMP, D DATE, B BLOB, C CHAR(4))")
    st.close(); c.close()
    import spark.implicits._
    val rows = Seq(
      (1, java.time.LocalDateTime.of(1, 1, 1, 0, 0, 0),
        java.time.LocalDate.of(1, 1, 1), Array[Byte](0, 1, -128, 127), "a'b "),
      (2, java.time.LocalDateTime.of(1969, 7, 20, 20, 17, 40, 123456000),
        java.time.LocalDate.of(1969, 7, 20), Array[Byte](), "    "),
      (3, java.time.LocalDateTime.of(9999, 12, 31, 23, 59, 59, 999999000),
        java.time.LocalDate.of(9999, 12, 31), Array[Byte](-1), "zzzz"))
    rows.toDF("K", "TS", "D", "B", "C")
      .write.format("graft-remote")
      .option("url", DerbyFixture.url).option("dbtable", "LITEDGE")
      .option("literalinsert", "true")
      .mode("append").save()
    val back = spark.read.format("graft-remote")
      .option("url", DerbyFixture.url).option("dbtable", "LITEDGE")
      .load().orderBy("K").collect()
    rows.zip(back).foreach { case ((_, ts, d, b, ch), r) =>
      assert(r.getAs[java.time.LocalDateTime]("TS") == ts,
        s"timestamp: ${r.getAs[Any]("TS")} != $ts")
      assert(r.getAs[java.sql.Date]("D").toLocalDate == d)
      assert(r.getAs[Array[Byte]]("B").toSeq == b.toSeq)
      assert(r.getAs[String]("C") == ch)
    }
  }

  // ---- unigram-LM vocabulary cap ---------------------------------------

  test("unigramProbs caps the collected vocabulary; totals stay full-corpus") {
    import spark.implicits._
    // "a" x6, "b" x4, "c" x2, "d" x1 -> 13 tokens total
    val df = Seq("a a a b b", "a a a b b c", "c d").toDF("text")
    val capped = graft.operators.LmOps.unigramProbs(df, "text", topK = 2)
    assert(capped.size == 2, s"cap not applied: ${capped.size}")
    assert(capped.toMap.keySet == Set("a", "b"))
    // probabilities divide by the FULL corpus total (13), not the kept
    // mass — capped tables must stay true probabilities
    assert(capped.toMap.apply("a") == 6.0 / 13.0)
    assert(capped.toMap.apply("b") == 4.0 / 13.0)
    // the default is bounded (driver-side collect of an unbounded
    // web-corpus vocabulary is an OOM); 0 is the explicit opt-out
    val dflt = graft.operators.LmOps.unigramProbs(df, "text")
    assert(dflt.size == 4)
    assert(graft.operators.LmOps.unigramProbs(df, "text", topK = 0).size == 4)
  }

  // ---- short-document n-gram fraction guard ----------------------------

  test("dupNgramFraction and topNgramFraction are 0.0 for docs shorter than n") {
    import spark.implicits._
    val df = Seq("one two", "a", "", "one one one one").toDF("text")
    val out = df.select(
      graft.operators.TextOps.dupNgramFraction(col("text"), 3).as("dup"),
      graft.operators.TextOps.topNgramFraction(col("text"), 3).as("top"))
      .collect()
    // first three rows have < 3 tokens → defined 0.0, never NULL/negative
    (0 to 2).foreach { i =>
      assert(!out(i).isNullAt(0) && out(i).getDouble(0) == 0.0)
      assert(!out(i).isNullAt(1) && out(i).getDouble(1) == 0.0)
    }
    // 4 tokens, n=3: 2 trigram occurrences, 1 distinct → dup 0.5, top 1.0
    assert(out(3).getDouble(0) == 0.5)
    assert(out(3).getDouble(1) == 1.0)
  }
}
