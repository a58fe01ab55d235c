package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** ScanCodec round trips — the Spark analogue of the reference's
  * protobuf codec round-trip test (`integration-tests/tests/common.rs:
  * 64-108`): describe a fully-pushed-down scan, encode to versioned
  * JSON, decode in "another process" (a fresh ScanState), execute, and
  * compare VALUES against the original DataFrame. */
class ScanCodecSpec extends AnyFunSuite {
  private lazy val spark = { DerbyFixture.init; SparkTestSession.spark }

  private def remote(extra: (String, String)*) = {
    var r = spark.read.format("graft-remote").option("url", DerbyFixture.url)
    extra.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }

  private def roundTrip(df: org.apache.spark.sql.DataFrame): Unit = {
    val json = ScanCodec.encode(ScanCodec.describe(df))
    val replayed = ScanCodec.execute(spark, ScanCodec.decode(json))
    // the codec reproduces the SCAN: types and values must round-trip
    // exactly; column NAMES are the scan's own (a pushed aggregate's
    // result columns are scan-internal agg_N until the enclosing plan
    // renames them, which is outside the scan description)
    assert(replayed.schema.fields.toSeq.map(_.dataType) ==
      df.schema.fields.toSeq.map(_.dataType),
      s"type drift through the codec:\n ${replayed.schema}\n vs ${df.schema}")
    val a = df.collect().map(_.toSeq).sortBy(_.mkString("|"))
    val b = replayed.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(a.toSeq == b.toSeq, s"values drift through the codec: $json")
  }

  test("filter + projection scan round-trips") {
    roundTrip(remote("dbtable" -> "NATION")
      .filter(col("N_REGIONKEY") < 3).select("N_NATIONKEY", "N_NAME"))
  }

  test("top-k (sort + limit) scan round-trips") {
    roundTrip(remote("dbtable" -> "NATION")
      .orderBy(col("N_NATIONKEY").desc).limit(4).select("N_NATIONKEY"))
  }

  test("pushed aggregate (GROUP BY) scan round-trips") {
    roundTrip(remote("dbtable" -> "NATION")
      .groupBy(col("N_REGIONKEY"))
      .agg(count(lit(1)).as("n"), max(col("N_NATIONKEY")).as("mx")))
  }

  test("query-sourced scan round-trips") {
    roundTrip(remote("query" ->
        "SELECT n_nationkey, n_regionkey FROM nation WHERE n_regionkey < 4")
      .filter(col("N_NATIONKEY") > 2))
  }

  test("encoded artifact is versioned; unknown versions are refused") {
    val st = ScanCodec.describe(remote("dbtable" -> "NATION"))
    assert(st.version == ScanCodec.Version)
    val json = ScanCodec.encode(st)
    assert(json.contains("\"version\":" + ScanCodec.Version))
    val future = json.replaceFirst(
      "\"version\":" + ScanCodec.Version, "\"version\":999")
    val e = intercept[IllegalArgumentException] { ScanCodec.decode(future) }
    assert(e.getMessage.contains("version"))
    intercept[IllegalArgumentException] {
      ScanCodec.decode("""{"options":{}}""")
    }
  }

  test("describe refuses ambiguous plans (joins of two remote scans)") {
    val a = remote("dbtable" -> "NATION")
    // self-join WITHOUT join pushdown shape: alias breaks bareness,
    // leaving two separate scans in the plan
    val two = a.select(col("N_NATIONKEY").as("k1"))
      .crossJoin(remote("dbtable" -> "NATION").limit(1)
        .select(col("N_NATIONKEY").as("k2")))
    val e = intercept[IllegalArgumentException] { ScanCodec.describe(two) }
    assert(e.getMessage.contains("exactly one"))
  }
}
