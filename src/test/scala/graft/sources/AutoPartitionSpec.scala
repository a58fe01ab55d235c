package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Auto-derived range-partition bounds: `partitioncolumn` +
  * `numpartitions` without lower/upper bounds probes the remote
  * MIN/MAX once at planning time. */
class AutoPartitionSpec extends AnyFunSuite {

  private def freshDb(tag: String, rows: Int, nullKeys: Boolean = false)
      : String = {
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    val url = s"jdbc:derby:/tmp/graft_ap_${tag}_${System.nanoTime()};create=true"
    val c = DriverManager.getConnection(url)
    val st = c.createStatement()
    st.executeUpdate("CREATE TABLE T (K INT, V VARCHAR(32))")
    (1 to rows).foreach { i =>
      val k = if (nullKeys) "NULL" else (i * 10).toString
      st.executeUpdate(s"INSERT INTO T VALUES ($k, 'v$i')")
    }
    st.close(); c.close()
    url
  }

  test("bounds probe splits the scan and loses no rows") {
    val spark = SparkTestSession.spark
    val url = freshDb("basic", 40)
    val df = spark.read.format("graft-remote").option("url", url)
      .option("dbtable", "T")
      .option("partitioncolumn", "K").option("numpartitions", "4")
      .load()
    assert(df.rdd.getNumPartitions == 4, "probe did not split the scan")
    assert(df.count() == 40)
    assert(df.agg(sum(col("K"))).collect().head.getLong(0) ==
      (1 to 40).map(_ * 10L).sum)
  }

  test("explicit bounds still win; a given bound is kept, missing probed") {
    val spark = SparkTestSession.spark
    val url = freshDb("mixed", 20)
    val df = spark.read.format("graft-remote").option("url", url)
      .option("dbtable", "T")
      .option("partitioncolumn", "K").option("numpartitions", "3")
      .option("lowerbound", "0") // upper probed from the remote
      .load()
    assert(df.rdd.getNumPartitions == 3)
    assert(df.count() == 20)
  }

  test("an all-NULL partition column falls back to one partition, complete") {
    val spark = SparkTestSession.spark
    val url = freshDb("nulls", 7, nullKeys = true)
    val df = spark.read.format("graft-remote").option("url", url)
      .option("dbtable", "T")
      .option("partitioncolumn", "K").option("numpartitions", "4")
      .load()
    assert(df.rdd.getNumPartitions == 1)
    assert(df.count() == 7)
  }
}
