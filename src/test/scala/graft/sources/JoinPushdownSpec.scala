package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Join pushdown (`SupportsPushDownJoin`): two graft-remote scans of the
  * same Derby database collapse into ONE remote SQL join when
  * `spark.sql.optimizer.datasourceV2JoinPushdown` is on. */
class JoinPushdownSpec extends AnyFunSuite {

  private lazy val spark = { DerbyFixture.init; regionInit; SparkTestSession.spark }

  private lazy val regionInit: Unit = {
    val c = DriverManager.getConnection(DerbyFixture.url)
    try {
      val st = c.createStatement()
      st.executeUpdate(
        """CREATE TABLE jp_region (
          | r_regionkey INT NOT NULL,
          | r_name VARCHAR(32) NOT NULL)""".stripMargin)
      (0 until 5).foreach(i =>
        st.executeUpdate(s"INSERT INTO jp_region VALUES ($i, 'REGION_$i')"))
      // private copy of the nation fixture: other suites append rows to the
      // shared NATION table, which would break this suite's exact counts
      st.executeUpdate(
        """CREATE TABLE jp_nation (
          | n_nationkey INT NOT NULL,
          | n_name VARCHAR(64) NOT NULL,
          | n_regionkey INT NOT NULL)""".stripMargin)
      val names = Seq("ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT",
        "ETHIOPIA", "FRANCE", "GERMANY", "INDIA", "INDONESIA")
      names.zipWithIndex.foreach { case (n, i) =>
        st.executeUpdate(s"INSERT INTO jp_nation VALUES ($i, '$n', ${i % 5})")
      }
      st.close()
    } finally c.close()
  }

  private def remote(extra: (String, String)*) = {
    var r = spark.read.format("graft-remote").option("url", DerbyFixture.url)
    extra.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }

  private def sparkJoinNodes(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val plan = df.queryExecution.executedPlan.toString
    Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
      "BroadcastNestedLoopJoin", "CartesianProduct").filter(plan.contains)
  }

  private def withJoinPushdown[T](f: => T): T = {
    spark.conf.set("spark.sql.optimizer.datasourceV2JoinPushdown", "true")
    try f
    finally spark.conf.unset("spark.sql.optimizer.datasourceV2JoinPushdown")
  }

  private def joined = remote("dbtable" -> "JP_NATION")
    .join(remote("dbtable" -> "JP_REGION"),
      col("N_REGIONKEY") === col("R_REGIONKEY"))

  test("inner equi-join collapses into one remote query (no Spark join node)") {
    val expected = joined.select("N_NATIONKEY", "R_NAME")
      .as[(Int, String)](org.apache.spark.sql.Encoders.product[(Int, String)])
      .collect().toSet
    assert(expected.size == 10)
    withJoinPushdown {
      val df = joined
      assert(sparkJoinNodes(df).isEmpty,
        s"expected pushed join, plan:\n${df.queryExecution.executedPlan}")
      val got = df.select("N_NATIONKEY", "R_NAME")
        .as[(Int, String)](org.apache.spark.sql.Encoders.product[(Int, String)])
        .collect().toSet
      assert(got == expected)
    }
  }

  test("self-join with duplicated column names uses generated aliases") {
    val n1 = remote("dbtable" -> "JP_NATION")
    val n2 = remote("dbtable" -> "JP_NATION")
    val j = n1.join(n2, n1("N_REGIONKEY") === n2("N_REGIONKEY"))
    val expected = withJoinPushdown(j.count())
    assert(expected == j.count()) // 10 nations, 2 per region -> 20 pairs
    assert(expected == 20)
    withJoinPushdown(assert(sparkJoinNodes(j).isEmpty))
  }

  test("pre-join filters fold into the pushed join's side subqueries") {
    withJoinPushdown {
      val df = remote("dbtable" -> "JP_NATION")
        .filter(col("N_NATIONKEY") < 5)
        .join(remote("dbtable" -> "JP_REGION").filter(col("R_REGIONKEY") <= 2),
          col("N_REGIONKEY") === col("R_REGIONKEY"))
      assert(sparkJoinNodes(df).isEmpty)
      assert(df.count() == 3) // nations 0..4 with regionkey i%5 in 0..2
    }
  }

  test("aggregate pushdown composes on top of a pushed join") {
    withJoinPushdown {
      val df = joined.agg(count(lit(1)).as("n"))
      assert(sparkJoinNodes(df).isEmpty)
      assert(df.collect().head.getLong(0) == 10)
    }
  }

  test("left outer join pushes and keeps unmatched left rows") {
    withJoinPushdown {
      // region 5..: no nations; nation regionkeys are 0..4 so all match —
      // flip: left = region (5 rows incl all matched), use a filtered right
      val df = remote("dbtable" -> "JP_REGION")
        .join(remote("dbtable" -> "JP_NATION").filter(col("N_NATIONKEY") < 3),
          col("R_REGIONKEY") === col("N_REGIONKEY"), "left")
      assert(sparkJoinNodes(df).isEmpty)
      val rows = df.select("R_REGIONKEY", "N_NATIONKEY").collect()
      assert(rows.length == 5) // 3 matched + 2 null-extended
      assert(rows.count(_.isNullAt(1)) == 2)
    }
  }

  test("ORDER BY + LIMIT composes on top of a pushed join (remote TopN)") {
    withJoinPushdown {
      val df = joined
        .orderBy(col("N_NATIONKEY").desc)
        .limit(3)
        .select("N_NATIONKEY", "R_NAME")
      assert(sparkJoinNodes(df).isEmpty,
        s"expected pushed join, plan:\n${df.queryExecution.executedPlan}")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedTopN"),
        s"expected TopN pushed into the joined scan, plan:\n$plan")
      val got = df.collect().map(r => (r.getInt(0), r.getString(1))).toSeq
      assert(got == Seq((9, "REGION_4"), (8, "REGION_3"), (7, "REGION_2")))
    }
  }

  test("join across different URLs is NOT pushed (falls back to Spark join)") {
    withJoinPushdown {
      val other = spark.createDataFrame(Seq((0, "x"), (1, "y")))
        .toDF("R_REGIONKEY", "TAG")
      val df = remote("dbtable" -> "JP_NATION")
        .join(other, col("N_REGIONKEY") === col("R_REGIONKEY"))
      assert(sparkJoinNodes(df).nonEmpty)
      assert(df.count() == 4)
    }
  }

  test("V2 predicate timestamp literals agree with the v1 filter path") {
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val micros = DateTimeUtils.instantToMicros(
      java.time.Instant.parse("2024-06-15T10:30:00.123456Z"))
    val builder = new V2PredicateSQL(DerbyDialect)
    def render(tpe: org.apache.spark.sql.types.DataType): String =
      builder.build(new Predicate("=",
        Array(Bridge.v2Column("ts"), Bridge.v2Literal(micros, tpe))))
    // instant semantics must round through the JVM default zone — the
    // SAME convention Dialect.literal uses for java.sql.Timestamp and
    // Instant, and the Literalizer uses on the write path; otherwise a
    // pushed join condition and pushed scan filters disagree about the
    // same instant on any non-UTC JVM
    val v1 = DerbyDialect.literal(DateTimeUtils.toJavaTimestamp(micros)).get
    val v1Instant = DerbyDialect.literal(DateTimeUtils.microsToInstant(micros)).get
    assert(render(TimestampType).endsWith(v1), s"${render(TimestampType)} vs $v1")
    assert(v1 == v1Instant, s"Timestamp vs Instant rendering split: $v1 / $v1Instant")
    // NTZ micros ARE the wall-clock time — no zone round-trip
    val ntz = DerbyDialect.timestampLiteral(DateTimeUtils.microsToLocalDateTime(micros))
    assert(render(TimestampNTZType).endsWith(ntz))
  }
}
