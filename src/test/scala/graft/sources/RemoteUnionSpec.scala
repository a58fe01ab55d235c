package graft.sources

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** RemoteUnion.unionAll: the merged frame must be ONE remote scan
  * (UNION ALL executes remotely), downstream pushdowns must reach the
  * merged query, and every safety rail must throw rather than silently
  * fall back. */
class RemoteUnionSpec extends AnyFunSuite {
  private lazy val spark = { DerbyFixture.init; SparkTestSession.spark }

  private def remote(extra: (String, String)*) = {
    var r = spark.read.format("graft-remote").option("url", DerbyFixture.url)
    extra.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }

  private def countScans(plan: LogicalPlan): Int =
    plan.collect { case _: DataSourceV2Relation => 1 }.sum

  test("merged frame is ONE remote scan and values equal Spark union") {
    val a = remote("query" ->
      "SELECT n_nationkey, n_name FROM nation WHERE MOD(n_nationkey, 2) = 0")
    val b = remote("query" ->
      "SELECT n_nationkey, n_name FROM nation WHERE MOD(n_nationkey, 2) = 1")
    val merged = RemoteUnion.unionAll(a, b)
    assert(countScans(merged.queryExecution.analyzed) == 1,
      "union must collapse to a single remote relation")
    val got = merged.collect().map(r => (r.getInt(0), r.getString(1))).sorted
    val want = a.unionAll(b).collect()
      .map(r => (r.getInt(0), r.getString(1))).sorted
    assert(got.toSeq == want.toSeq)
  }

  test("filters and aggregates push INTO the merged query") {
    val a = remote("dbtable" -> "NATION")
    val b = remote("dbtable" -> "NATION")
    val merged = RemoteUnion.unionAll(a, b)
    val filtered = merged.filter(col("N_REGIONKEY") < 2).select("N_NAME")
    val fplan = filtered.queryExecution.executedPlan.toString
    val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findFirstIn(fplan).getOrElse("")
    assert(pushed.contains("N_REGIONKEY"),
      s"filter must reach the merged scan; pushed: $pushed\nplan: $fplan")
    val agged = merged.agg(count(lit(1)).as("n"))
    val aplan = agged.queryExecution.executedPlan.toString
    assert(aplan.contains("PushedAggregates: true"),
      s"aggregate must reach the merged scan; plan: $aplan")
    assert(agged.collect().head.getLong(0) ==
      2 * remote("dbtable" -> "NATION").count())
  }

  test("non-bare input (filter already applied) throws") {
    val a = remote("dbtable" -> "NATION").filter(col("N_REGIONKEY") < 2)
    val b = remote("dbtable" -> "NATION")
    val e = intercept[IllegalArgumentException] {
      RemoteUnion.unionAll(a, b)
    }
    assert(e.getMessage.contains("bare"))
  }

  test("different databases throw, with credentials REDACTED") {
    val a = remote("dbtable" -> "NATION")
    val other = s"${DerbyFixture.url};user=app;password=sekret123"
    val b = spark.read.format("graft-remote")
      .option("url", other).option("dbtable", "NATION").load()
    val e = intercept[IllegalArgumentException] {
      RemoteUnion.unionAll(a, b)
    }
    assert(e.getMessage.contains("different databases"))
    assert(!e.getMessage.contains("sekret123"),
      s"JDBC credentials leaked into the error: ${e.getMessage}")
  }

  test("positional type mismatch throws") {
    val a = remote("query" -> "SELECT n_nationkey FROM nation")
    val b = remote("query" -> "SELECT n_name FROM nation")
    val e = intercept[IllegalArgumentException] {
      RemoteUnion.unionAll(a, b)
    }
    assert(e.getMessage.contains("column types"))
  }

  test("n-way union is ONE flat remote query, values equal Spark union") {
    val shard = (pred: String) => remote("query" ->
      s"SELECT n_nationkey, n_name FROM nation WHERE $pred")
    val parts = Seq("MOD(n_nationkey, 3) = 0", "MOD(n_nationkey, 3) = 1",
      "MOD(n_nationkey, 3) = 2").map(shard)
    val merged = RemoteUnion.unionAll(parts)
    assert(countScans(merged.queryExecution.analyzed) == 1)
    // flat merge, not a nested fold: exactly two UNION ALLs and one
    // subquery wrap PER SHARD (a pairwise fold would re-wrap each
    // step's merged query, compounding the nesting)
    val inner = ScanCodec.describe(merged)
    assert(inner.sourceKind == "query" &&
      "UNION ALL".r.findAllIn(inner.source).size == 2 &&
      "\\(SELECT".r.findAllIn(inner.source).size == 3,
      s"merged SQL not flat: ${inner.source}")
    val got = merged.collect().map(r => (r.getInt(0), r.getString(1))).sorted
    val want = parts.reduce(_ unionAll _).collect()
      .map(r => (r.getInt(0), r.getString(1))).sorted
    assert(got.toSeq == want.toSeq)
  }

  test("one-sided schema-shaping options throw (no silent drop)") {
    val a = remote("dbtable" -> "NATION")
    val b = remote("dbtable" -> "NATION",
      "structcol.n_name" -> "a INT, b INT")
    val e = intercept[IllegalArgumentException] {
      RemoteUnion.unionAll(a, b)
    }
    assert(e.getMessage.contains("structcol"))
  }
}
