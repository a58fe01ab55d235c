package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Keyed upsert (`mergekeys=...`): the staged commit lands as one
  * atomic ANSI MERGE — matched keys update in place, unmatched keys
  * insert, and replaying the identical batch is a no-op. The
  * incremental-pipeline write shape (daily deltas keyed by id), built
  * on the same staging machinery as the atomic overwrite. */
class UpsertSpec extends AnyFunSuite {

  private def freshDb(tag: String): String = {
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    val url = s"jdbc:derby:/tmp/graft_ups_${tag}_${System.nanoTime()};create=true"
    val c = DriverManager.getConnection(url)
    val st = c.createStatement()
    st.executeUpdate("CREATE TABLE T (K INT, NAME VARCHAR(32), V DOUBLE)")
    st.close(); c.close()
    url
  }

  private def df(rows: Seq[(Int, String, Double)]): DataFrame = {
    val spark = SparkTestSession.spark
    import spark.implicits._
    rows.toDF("K", "NAME", "V")
  }

  private def upsert(url: String, d: DataFrame): Unit =
    d.write.format("graft-remote").option("url", url)
      .option("dbtable", "T").option("mergekeys", "K")
      .option("stagingwrite", "true").mode("append").save()

  private def readBack(url: String): Seq[(Int, String, Double)] = {
    val spark = SparkTestSession.spark
    spark.read.format("graft-remote").option("url", url)
      .option("dbtable", "T").load()
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
      .toSeq.sortBy(_._1)
  }

  test("matched keys update in place, unmatched keys insert") {
    val url = freshDb("basic")
    upsert(url, df(Seq((1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0))))
    upsert(url, df(Seq((2, "b2", 20.0), (4, "d", 4.0))))
    assert(readBack(url) == Seq((1, "a", 1.0), (2, "b2", 20.0),
      (3, "c", 3.0), (4, "d", 4.0)))
  }

  test("replaying the same delta is idempotent") {
    val url = freshDb("idem")
    upsert(url, df(Seq((1, "a", 1.0), (2, "b", 2.0))))
    val delta = Seq((2, "b2", 20.0), (3, "c", 3.0))
    upsert(url, df(delta))
    val afterFirst = readBack(url)
    upsert(url, df(delta)) // the retry/replay case
    assert(readBack(url) == afterFirst)
    assert(afterFirst == Seq((1, "a", 1.0), (2, "b2", 20.0), (3, "c", 3.0)))
  }

  test("composite merge keys match on every key column") {
    val url = freshDb("comp")
    // (K, NAME) is the key; V is the payload
    def up(d: DataFrame): Unit =
      d.write.format("graft-remote").option("url", url)
        .option("dbtable", "T").option("mergekeys", "K, NAME")
        .option("stagingwrite", "true").mode("append").save()
    up(df(Seq((1, "a", 1.0), (1, "b", 2.0))))
    up(df(Seq((1, "a", 10.0), (2, "a", 3.0))))
    assert(readBack(url).toSet ==
      Set((1, "a", 10.0), (1, "b", 2.0), (2, "a", 3.0)))
  }

  test("a batch with duplicated merge keys is rejected loudly") {
    val url = freshDb("dup")
    val e = intercept[Exception] {
      upsert(url, df(Seq((1, "a", 1.0), (1, "b", 2.0))))
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("duplicated merge-key")), msgs(e))
    // and the failed upsert left the target untouched (staged = atomic)
    assert(readBack(url).isEmpty)
  }

  test("mergekeys without stagingwrite is rejected") {
    val url = freshDb("nostg")
    val e = intercept[Exception] {
      df(Seq((1, "a", 1.0))).write.format("graft-remote")
        .option("url", url).option("dbtable", "T")
        .option("mergekeys", "K").mode("append").save()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("stagingwrite")), msgs(e))
  }

  test("mergekeys naming a column the batch does not write is rejected") {
    val url = freshDb("nocol")
    val e = intercept[Exception] {
      df(Seq((1, "a", 1.0))).write.format("graft-remote")
        .option("url", url).option("dbtable", "T")
        .option("mergekeys", "MISSING").option("stagingwrite", "true")
        .mode("append").save()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("mergekeys")), msgs(e))
  }

  test("upsert + overwrite mode is rejected as contradictory") {
    val url = freshDb("ovw")
    val e = intercept[Exception] {
      df(Seq((1, "a", 1.0))).write.format("graft-remote")
        .option("url", url).option("dbtable", "T")
        .option("mergekeys", "K").option("stagingwrite", "true")
        .option("allowoverwrite", "true").mode("overwrite").save()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("contradicts overwrite")), msgs(e))
  }
}
