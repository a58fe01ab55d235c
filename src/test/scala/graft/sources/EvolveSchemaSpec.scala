package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Write-side schema evolution (r20, `evolveschema=true`): the sink
  * ALTERs missing columns in before the append, existing rows read
  * NULL for them, and the default posture (loud error on unknown
  * columns) is unchanged without the opt-in. */
class EvolveSchemaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshTable(): String = {
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    val url = s"jdbc:derby:memory:evo_${System.nanoTime()};create=true"
    val c = DriverManager.getConnection(url)
    val st = c.createStatement()
    st.executeUpdate("CREATE TABLE T (ID INT, NAME VARCHAR(32))")
    st.executeUpdate("INSERT INTO T VALUES (1, 'base')")
    st.close(); c.close()
    url
  }

  test("wider append without evolveschema fails loudly, table untouched") {
    val url = freshTable()
    val wider = Seq((2, "delta", 9.5)).toDF("ID", "NAME", "SCORE")
    val e = intercept[Exception] {
      wider.write.format("graft-remote").option("url", url)
        .option("dbtable", "T").mode("append").save()
    }
    assert(e.toString.toLowerCase.contains("score") ||
      Option(e.getCause).exists(_.toString.toLowerCase.contains("score")),
      s"error must name the unknown column: $e")
    val rows = spark.read.format("graft-remote").option("url", url)
      .option("dbtable", "T").load()
    assert(rows.schema.fieldNames.toSeq == Seq("ID", "NAME"))
    assert(rows.count() == 1)
  }

  test("evolveschema adds the column; old rows read NULL, delta its values") {
    val url = freshTable()
    Seq((2, "delta", 9.5), (3, "delta2", -1.25))
      .toDF("ID", "NAME", "SCORE")
      .write.format("graft-remote").option("url", url)
      .option("dbtable", "T").option("evolveschema", "true")
      .mode("append").save()
    val rows = spark.read.format("graft-remote").option("url", url)
      .option("dbtable", "T").load()
      .select(col("ID"), col("NAME"), col("SCORE"))
      .orderBy(col("ID")).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    assert(rows(0).isNullAt(2), "pre-evolution row must read NULL")
    assert(rows(1).getDouble(2) == 9.5 && rows(2).getDouble(2) == -1.25)
  }

  test("evolveschema with no missing columns issues no DDL (idempotent)") {
    val url = freshTable()
    Seq((4, "same")).toDF("ID", "NAME")
      .write.format("graft-remote").option("url", url)
      .option("dbtable", "T").option("evolveschema", "true")
      .mode("append").save()
    val rows = spark.read.format("graft-remote").option("url", url)
      .option("dbtable", "T").load()
    assert(rows.schema.fieldNames.toSeq == Seq("ID", "NAME"))
    assert(rows.count() == 2)
  }

  test("evolveschema on a query source is refused") {
    val url = freshTable()
    val e = intercept[Exception] {
      Seq((5, "x", 1.0)).toDF("ID", "NAME", "SCORE")
        .write.format("graft-remote").option("url", url)
        .option("query", "SELECT * FROM T")
        .option("evolveschema", "true")
        .mode("append").save()
    }
    assert(e.toString.contains("ALTER") ||
      Option(e.getCause).exists(_.toString.contains("ALTER")), s"$e")
  }
}
