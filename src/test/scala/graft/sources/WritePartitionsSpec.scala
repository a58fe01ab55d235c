package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** `writepartitions`: the sink caps write concurrency through Spark's
  * RequiresDistributionAndOrdering negotiation — the remote sees at
  * most N concurrent writers regardless of the input's partitioning
  * (the knob BASELINE.md's Derby writer-contention measurements call
  * for: more writers ≠ faster on single-writer engines). */
class WritePartitionsSpec extends AnyFunSuite {

  private def freshDb(tag: String): String = {
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    val url = s"jdbc:derby:/tmp/graft_wp_${tag}_${System.nanoTime()};create=true"
    val c = DriverManager.getConnection(url)
    val st = c.createStatement()
    st.executeUpdate("CREATE TABLE T (K INT, V VARCHAR(32))")
    st.close(); c.close()
    url
  }

  /** Connections opened by one save(): task connections + a constant
    * driver-side overhead (schema probe). Calibrated below with a
    * 1-partition write so the assertions count TASKS, not overhead. */
  private def writeDelta(url: String, rows: Int, parts: Int,
      wp: Option[Int]): Long = {
    val spark = SparkTestSession.spark
    val df = spark.range(rows.toLong)
      .select(col("id").cast("int").as("K"),
        concat(lit("v"), col("id")).as("V"))
      .repartition(parts)
    val before = GraftConnections.state._1
    var w = df.write.format("graft-remote").option("url", url)
      .option("dbtable", "T")
    wp.foreach(n => w = w.option("writepartitions", n.toString))
    w.mode("append").save()
    GraftConnections.state._1 - before
  }

  test("writepartitions caps the write stage at N tasks") {
    val spark = SparkTestSession.spark
    val url = freshDb("cap")
    val overhead = writeDelta(url, 10, 1, None) - 1
    val tasks = writeDelta(url, 1000, 16, Some(2)) - overhead
    assert(tasks == 2, s"expected 2 write tasks, saw $tasks connections")
    // and the data still lands completely
    val n = spark.read.format("graft-remote").option("url", url)
      .option("dbtable", "T").load().count()
    assert(n == 1010)
  }

  test("without writepartitions the input partitioning is kept") {
    val url = freshDb("keep")
    val overhead = writeDelta(url, 10, 1, None) - 1
    val tasks = writeDelta(url, 100, 4, None) - overhead
    assert(tasks == 4, s"expected 4 write tasks, saw $tasks connections")
  }

  test("writepartitions must be positive") {
    val spark = SparkTestSession.spark
    val url = freshDb("bad")
    val df = spark.range(10)
      .select(col("id").cast("int").as("K"), lit("x").as("V"))
    val e = intercept[Exception] {
      df.write.format("graft-remote").option("url", url)
        .option("dbtable", "T").option("writepartitions", "0")
        .mode("append").save()
    }
    assert(e.getMessage.contains("writepartitions") ||
      e.getCause != null && e.getCause.getMessage.contains("writepartitions"))
  }
}
