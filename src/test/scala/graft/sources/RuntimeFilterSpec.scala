package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Runtime-filter (broadcast-join IN list) pushdown — the connector
  * analogue of dynamic partition pruning. When the remote scan is the
  * probe side of a broadcast join, Spark hands the build side's
  * join-key values to `RemoteScan.filter` at execution time and the
  * scan appends `key IN (…)` to the remote SQL, so the remote ships
  * only joinable rows. Results must be identical with the feature on
  * or off (it is optimization-only; Spark re-evaluates the join).
  */
class RuntimeFilterSpec extends AnyFunSuite {

  private lazy val spark = { DerbyFixture.init; SparkTestSession.spark }

  private def fact() = spark.read.format("graft-remote")
    .option("url", DerbyFixture.url).option("dbtable", "NATION").load()

  private def dim() = spark.read
    .parquet("/root/testdata/sf0.001/region.parquet")
    .filter(col("r_name").isin("ASIA", "AMERICA"))

  test("broadcast-join runtime IN filter reaches the remote SQL") {
    val joined = fact().join(broadcast(dim()),
      col("N_REGIONKEY") === col("r_regionkey"))
    ScanSqlLog.clear()
    val withRf = joined.orderBy(col("N_NATIONKEY")).collect()
    val pushedSqls = ScanSqlLog.recent

    val expected = fact()
      .filter(col("N_REGIONKEY").isin(
        dim().select("r_regionkey").collect().map(_.getInt(0)).toSeq: _*))
      .orderBy(col("N_NATIONKEY")).collect()
    assert(withRf.map(_.toSeq.take(3)).toSeq ==
      expected.map(_.toSeq).toSeq)

    assert(pushedSqls.exists(s =>
      s.contains("NATION") && s.contains("\"N_REGIONKEY\" IN (")),
      s"no runtime IN filter in executed remote SQL:\n${pushedSqls.mkString("\n")}")
  }

  test("runtime filtering can be disabled and results do not change") {
    val factOff = spark.read.format("graft-remote")
      .option("url", DerbyFixture.url).option("dbtable", "NATION")
      .option("runtimefilterpushdown", "false").load()
    val joined = factOff.join(broadcast(dim()),
      col("N_REGIONKEY") === col("r_regionkey"))
    ScanSqlLog.clear()
    val rows = joined.orderBy(col("N_NATIONKEY")).collect()
    assert(rows.length == 4) // regionkeys of ASIA/AMERICA: 1 and 2 -> 4 nations
    assert(!ScanSqlLog.recent.exists(_.contains("\"N_REGIONKEY\" IN (")),
      "disabled scan must not receive a runtime IN filter")
  }

  test("oversized IN lists are skipped, never truncated") {
    val factCapped = spark.read.format("graft-remote")
      .option("url", DerbyFixture.url).option("dbtable", "NATION")
      .option("runtimefiltermaxinlist", "1").load()
    val joined = factCapped.join(broadcast(dim()),
      col("N_REGIONKEY") === col("r_regionkey"))
    ScanSqlLog.clear()
    val rows = joined.collect()
    assert(rows.length == 4)
    assert(!ScanSqlLog.recent.exists(_.contains("\"N_REGIONKEY\" IN (")),
      "capped scan must not receive a runtime IN filter")
  }
}
