package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Nested-struct decode through the scan (reference SdeGeometry,
  * `connection/oracle.rs:528-650`): a scalar JSON remote column
  * declared via `structcol.<name>` decodes as a typed struct. */
class StructDecodeSpec extends AnyFunSuite {
  private lazy val spark = { DerbyFixture.init; SparkTestSession.spark }

  private lazy val url: String = {
    val c = DriverManager.getConnection(DerbyFixture.url)
    val st = c.createStatement()
    try st.executeUpdate("DROP TABLE STRUCT_T") catch { case _: Exception => () }
    st.executeUpdate("CREATE TABLE STRUCT_T (K INT, J VARCHAR(512))")
    st.executeUpdate(
      """INSERT INTO STRUCT_T VALUES
        | (1, '{"a": 7, "b": 2.5, "s": "x", "bin": "aGk=", "inner": {"c": true}, "xs": [1, 2, 3]}'),
        | (2, '{"a": null, "b": -1.0, "s": "", "bin": null, "inner": null, "xs": []}'),
        | (3, NULL)""".stripMargin)
    st.close(); c.close()
    DerbyFixture.url
  }

  private def read(ddl: String) =
    spark.read.format("graft-remote")
      .option("url", url).option("dbtable", "STRUCT_T")
      .option("structcol.j", ddl)
      .load()

  test("JSON column decodes as a typed struct incl. nesting, binary, arrays") {
    val df = read("a INT, b DOUBLE, s STRING, bin BINARY, " +
      "inner STRUCT<c: BOOLEAN>, xs ARRAY<INT>")
    assert(df.schema("J").dataType.isInstanceOf[StructType])
    val rows = df.orderBy("K").collect()
    val r1 = rows(0).getStruct(1)
    assert(r1.getInt(0) == 7 && r1.getDouble(1) == 2.5 && r1.getString(2) == "x")
    assert(new String(r1.getAs[Array[Byte]](3), "UTF-8") == "hi")
    assert(r1.getStruct(4).getBoolean(0))
    assert(r1.getSeq[Int](5) == Seq(1, 2, 3))
    val r2 = rows(1).getStruct(1)
    assert(r2.isNullAt(0) && r2.getDouble(1) == -1.0 && r2.getString(2) == "")
    assert(r2.isNullAt(3) && r2.isNullAt(4) && r2.getSeq[Int](5).isEmpty)
    assert(rows(2).isNullAt(1), "NULL json must decode as NULL struct")
  }

  test("nested-pruned reads decode only the requested subfields") {
    val df = read("a INT, b DOUBLE, s STRING")
      .select(col("K"), col("J.a").as("a"))
      .orderBy("K")
    val rows = df.collect()
    assert(rows.map(r => if (r.isNullAt(1)) -1 else r.getInt(1)).toSeq ==
      Seq(7, -1, -1))
  }

  test("struct rides the Transform (external Row) path too") {
    val df = spark.read.format("graft-remote")
      .option("url", url).option("dbtable", "STRUCT_T")
      .option("structcol.j", "a INT, s STRING")
      .option("transformclass", "graft.sources.DoubleHasNextTransform")
      .load()
    val rows = df.orderBy("K").collect()
    assert(rows(0).getStruct(1).getInt(0) == 7)
    assert(rows(0).getStruct(1).getString(1) == "x")
    assert(rows(2).isNullAt(1))
  }

  test("filters on struct subfields stay Spark-side (declined, not broken SQL)") {
    // a pushed "J"."a" would be a remote syntax/column error against
    // the JSON VARCHAR; the compiler must decline dotted references so
    // Spark evaluates the predicate after decode
    val df = read("a INT, b DOUBLE, s STRING")
      .filter(col("J.a") === 7)
      .select(col("K"))
    val rows = df.collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1))
    // struct-level null checks MAY push (VARCHAR null == struct null)
    val nn = read("a INT").filter(col("J").isNotNull).count()
    assert(nn == 2)
  }

  test("struct columns round-trip through the WRITE path (JSON encode ⇄ decode)") {
    url // fixture init
    val c = DriverManager.getConnection(DerbyFixture.url)
    val st = c.createStatement()
    try st.executeUpdate("DROP TABLE STRUCT_W") catch { case _: Exception => () }
    st.executeUpdate("CREATE TABLE STRUCT_W (K INT, J VARCHAR(512))")
    st.close(); c.close()
    import spark.implicits._
    val df = Seq((1, (7, 2.5, "x", Array[Byte](104, 105))),
        (2, (-1, 0.0, "", Array[Byte]())))
      .toDF("K", "J")
      .select(col("K"), col("J").cast(
        "struct<a: int, b: double, s: string, bin: binary>").as("J"))
    for (literal <- Seq(false, true)) {
      val cl = DriverManager.getConnection(DerbyFixture.url)
      cl.createStatement().executeUpdate("DELETE FROM STRUCT_W"); cl.close()
      df.write.format("graft-remote")
        .option("url", DerbyFixture.url).option("dbtable", "STRUCT_W")
        .option("literalinsert", literal.toString)
        .mode("append").save()
      val back = spark.read.format("graft-remote")
        .option("url", DerbyFixture.url).option("dbtable", "STRUCT_W")
        .option("structcol.j", "a INT, b DOUBLE, s STRING, bin BINARY")
        .load().orderBy("K").collect()
      assert(back.length == 2, s"literal=$literal")
      val r1 = back(0).getStruct(1)
      assert(r1.getInt(0) == 7 && r1.getDouble(1) == 2.5 &&
        r1.getString(2) == "x" &&
        new String(r1.getAs[Array[Byte]](3), "UTF-8") == "hi",
        s"literal=$literal: $r1")
      val r2 = back(1).getStruct(1)
      assert(r2.getInt(0) == -1 && r2.getDouble(1) == 0.0 &&
        r2.getString(2) == "" && r2.getAs[Array[Byte]](3).isEmpty)
    }
  }

  test("structcol for an absent column fails loudly") {
    val e = intercept[Exception] {
      spark.read.format("graft-remote")
        .option("url", url).option("dbtable", "STRUCT_T")
        .option("structcol.nope", "a INT").load().collect()
    }
    assert(e.getMessage.contains("nope") ||
      Option(e.getCause).exists(_.getMessage.contains("nope")))
  }
}
