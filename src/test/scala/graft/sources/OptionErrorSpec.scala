package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Misconfiguration probes: errors must name the offending option. */
class OptionErrorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("missing url names the option") {
    val e = intercept[Exception] {
      spark.read.format("graft-remote").option("dbtable", "T").load()
    }
    assert(e.getMessage.contains("url"))
  }

  test("both dbtable and query is rejected") {
    val e = intercept[Exception] {
      spark.read.format("graft-remote")
        .option("url", "jdbc:derby:memory:x;create=true")
        .option("dbtable", "T").option("query", "SELECT 1").load()
    }
    assert(e.getMessage.contains("dbtable") && e.getMessage.contains("query"))
  }
}
