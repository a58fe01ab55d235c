package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** TopN / OFFSET / SUM pushdown + the plan-shipping parity check
  * (SURVEY §2.1 O9: everything a task needs must serialize). */
class PushdownExtraSpec extends AnyFunSuite {
  private lazy val spark = { DerbyFixture.init; SparkTestSession.spark }

  private def remote(extra: (String, String)*) = {
    var r = spark.read.format("graft-remote").option("url", DerbyFixture.url)
    extra.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }

  test("top-k (ORDER BY + LIMIT) pushes down to the remote SQL") {
    val df = remote("dbtable" -> "NATION")
      .orderBy(col("N_NATIONKEY").desc).limit(3)
      .select("N_NATIONKEY")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedTopN: [\"N_NATIONKEY\" DESC"), s"plan: $plan")
    // rows 100/101/200 were appended by the write tests; top-3 keys desc
    val keys = df.collect().map(_.getInt(0)).toSeq
    assert(keys.length == 3 && keys == keys.sorted.reverse)
  }

  test("offset pushes down on single-partition scans") {
    val all = remote("dbtable" -> "NATION")
      .orderBy(col("N_NATIONKEY")).select("N_NATIONKEY")
      .collect().map(_.getInt(0)).toSeq
    val df = remote("dbtable" -> "NATION")
      .orderBy(col("N_NATIONKEY")).select("N_NATIONKEY")
      .offset(2)
    assert(df.collect().map(_.getInt(0)).toSeq == all.drop(2))
  }

  test("global SUM pushes down completely (int widened, double exact)") {
    val df = remote("dbtable" -> "NATION")
      .agg(sum(col("N_REGIONKEY")).as("s"), count(lit(1)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates: true"), s"plan: $plan")
    val viaSpark = remote("dbtable" -> "NATION")
      .select(col("N_REGIONKEY").cast("long")).groupBy()
      .sum().collect().head.getLong(0)
    assert(df.collect().head.getLong(0) == viaSpark)
  }

  test("SELECT DISTINCT pushes down as a remote GROUP BY (no aggregates)") {
    // Spark plans distinct() as an Aggregate with grouping columns and
    // an empty aggregate list; complete pushdown must ship it as a
    // remote GROUP BY so only distinct rows cross the wire
    val df = remote("dbtable" -> "NATION")
      .select(col("N_REGIONKEY")).distinct()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates: true"), s"plan: $plan")
    val got = df.collect().map(_.getInt(0)).toSet
    val viaSpark = remote("dbtable" -> "NATION")
      .select("N_REGIONKEY").collect().map(_.getInt(0)).toSet
    assert(got == viaSpark)
  }

  test("global AVG pushes down for integral columns, not for doubles") {
    val df = remote("dbtable" -> "NATION").agg(avg(col("N_REGIONKEY")).as("a"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates: true"), s"plan: $plan")
    val viaSpark = remote("dbtable" -> "NATION")
      .select(col("N_REGIONKEY").cast("double"))
      .agg(avg(col("N_REGIONKEY"))).collect().head.getDouble(0)
    assert(df.collect().head.getDouble(0) == viaSpark)
    // non-terminating mean: {1,2,4} -> 7/3. The pushed value must be the
    // bit-exact IEEE quotient Spark's own avg computes — a remote engine's
    // native AVG would truncate at the operand's decimal scale
    val c = java.sql.DriverManager.getConnection(DerbyFixture.url)
    try {
      val st = c.createStatement()
      try st.executeUpdate("CREATE TABLE avg_t (v INT)")
      catch { case _: java.sql.SQLException => st.executeUpdate("DELETE FROM avg_t") }
      st.executeUpdate("INSERT INTO avg_t VALUES (1), (2), (4)")
      st.close()
    } finally c.close()
    val pushed = remote("dbtable" -> "AVG_T").agg(avg(col("V")).as("a"))
    assert(pushed.queryExecution.executedPlan.toString
      .contains("PushedAggregates: true"))
    assert(pushed.collect().head.getDouble(0) == 7.0 / 3.0)
    // double column: compileAgg refuses complete AVG (ulp-order hazard),
    // so Spark decomposes into pushed SUM + COUNT and divides itself —
    // visible as a Project with sum/count over the scan
    val dbl = remote("dbtable" -> "ALL_TYPES").agg(avg(col("C_DOUBLE")).as("a"))
    val dblPlan = dbl.queryExecution.executedPlan.toString
    assert(dblPlan.contains("sum(") && dblPlan.contains("count("),
      s"expected sum/count decomposition: $dblPlan")
    assert(dbl.collect().head.getDouble(0) == 3.25)
  }

  test("scan configuration serializes for task shipping (O9 parity)") {
    val opts = RemoteOptions(Map(
      "url" -> DerbyFixture.url, "dbtable" -> "NATION",
      "fetchsize" -> "512", "transformclass" -> "graft.sources.RenameTransform"))
    val schema = Jdbc.inferSchema(RemoteOptions(
      Map("url" -> DerbyFixture.url, "dbtable" -> "NATION")))
    val payload: Seq[Any] = Seq(opts, schema, DerbyDialect, PostgresDialect,
      RemoteSource.Query("SELECT 1"), new RenameTransform)
    payload.foreach { obj =>
      val bos = new ByteArrayOutputStream()
      new ObjectOutputStream(bos).writeObject(obj)
      val back = new ObjectInputStream(
        new ByteArrayInputStream(bos.toByteArray)).readObject()
      assert(back != null)
      (obj, back) match {
        case (a: RemoteOptions, b: RemoteOptions) => assert(a.map == b.map)
        case (a: RemoteSchema, b: RemoteSchema) => assert(a == b)
        case (a: RemoteSource.Query, b: RemoteSource.Query) => assert(a == b)
        case _ => () // dialect objects / transforms: non-null round-trip is the check
      }
    }
  }
}
