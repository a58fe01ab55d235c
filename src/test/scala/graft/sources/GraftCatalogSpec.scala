package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The TableCatalog mount: SQL users address the remote database as a
  * Spark catalog — SELECT, SHOW TABLES, CREATE TABLE + INSERT all route
  * through the connector. */
class GraftCatalogSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    DerbyFixture.init
    s.conf.set("spark.sql.catalog.rdb", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.rdb.url", DerbyFixture.url)
    s
  }

  test("SELECT through the catalog is a connector scan with pushdown") {
    val df = spark.sql(
      "SELECT N_NAME FROM rdb.APP.NATION WHERE N_REGIONKEY = 2 ORDER BY N_NAME")
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("BRAZIL", "GERMANY")) // fixture regionkey = i % 5 -> ids 2, 7
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft-remote"), s"plan: $plan")
    assert(plan.contains("N_REGIONKEY"), s"filter should push: $plan")
  }

  test("SHOW TABLES lists the remote schema's tables") {
    val tables = spark.sql("SHOW TABLES IN rdb.APP")
      .select("tableName").collect().map(_.getString(0)).toSet
    assert(tables.contains("NATION"))
  }

  test("SHOW NAMESPACES lists remote schemas") {
    val ns = spark.sql("SHOW NAMESPACES IN rdb")
      .collect().map(_.getString(0)).toSet
    assert(ns.contains("APP"))
  }

  test("CREATE TABLE + INSERT + SELECT round-trips through the connector") {
    spark.sql("DROP TABLE IF EXISTS rdb.APP.CAT_RT")
    spark.sql("CREATE TABLE rdb.APP.CAT_RT (ID BIGINT, NAME STRING, SCORE DOUBLE)")
    spark.sql("INSERT INTO rdb.APP.CAT_RT VALUES (1, 'a', 0.5), (2, 'b', 1.5)")
    // named-column insert routes by name (and may reorder)
    spark.sql(
      "INSERT INTO rdb.APP.CAT_RT (SCORE, ID, NAME) VALUES (2.5, 3, 'c')")
    val back = spark.sql("SELECT ID, NAME, SCORE FROM rdb.APP.CAT_RT ORDER BY ID")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(back == Seq((1L, "a", 0.5), (2L, "b", 1.5), (3L, "c", 2.5)))
    assert(spark.sql("SHOW TABLES IN rdb.APP").select("tableName")
      .collect().map(_.getString(0)).toSet.contains("CAT_RT"))
    spark.sql("DROP TABLE rdb.APP.CAT_RT")
    assert(!spark.sql("SHOW TABLES IN rdb.APP").select("tableName")
      .collect().map(_.getString(0)).toSet.contains("CAT_RT"))
  }

  test("CREATE TABLE AS SELECT derives remote DDL from the query schema") {
    spark.sql("DROP TABLE IF EXISTS rdb.APP.CAT_CTAS")
    spark.sql(
      """CREATE TABLE rdb.APP.CAT_CTAS AS
        |SELECT N_REGIONKEY AS RK, count(*) AS N_NATIONS
        |FROM rdb.APP.NATION GROUP BY N_REGIONKEY""".stripMargin)
    val back = spark.sql("SELECT RK, N_NATIONS FROM rdb.APP.CAT_CTAS ORDER BY RK")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(back == (0 to 4).map(rk => (rk, 2L)), s"got $back")
    // the table is REAL on the remote (visible outside Spark)
    val c = java.sql.DriverManager.getConnection(DerbyFixture.url)
    try {
      val rs = c.createStatement().executeQuery(
        "SELECT COUNT(1) FROM APP.CAT_CTAS")
      rs.next(); assert(rs.getLong(1) == 5); rs.close()
    } finally c.close()
    spark.sql("DROP TABLE rdb.APP.CAT_CTAS")
  }

  test("INSERT OVERWRITE through the catalog (allowoverwrite flows from catalog config)") {
    spark.conf.set("spark.sql.catalog.rdbow", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.rdbow.url", DerbyFixture.url)
    spark.conf.set("spark.sql.catalog.rdbow.allowoverwrite", "true")
    spark.conf.set("spark.sql.catalog.rdbow.stagingwrite", "true")
    spark.sql("DROP TABLE IF EXISTS rdbow.APP.CAT_OVW")
    spark.sql("CREATE TABLE rdbow.APP.CAT_OVW (ID BIGINT, NAME STRING)")
    spark.sql("INSERT INTO rdbow.APP.CAT_OVW VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT OVERWRITE rdbow.APP.CAT_OVW VALUES (9, 'z')")
    val back = spark.sql("SELECT ID, NAME FROM rdbow.APP.CAT_OVW")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(back == Seq((9L, "z")), s"got $back")
    // without the catalog opt-in, overwrite stays rejected
    spark.sql("DROP TABLE IF EXISTS rdb.APP.CAT_OVW2")
    spark.sql("CREATE TABLE rdb.APP.CAT_OVW2 (ID BIGINT)")
    val e = intercept[Exception] {
      spark.sql("INSERT OVERWRITE rdb.APP.CAT_OVW2 VALUES (1)")
    }
    assert(e.getMessage.toLowerCase.contains("truncate") ||
      e.getMessage.toLowerCase.contains("overwrite"))
    spark.sql("DROP TABLE rdbow.APP.CAT_OVW")
    spark.sql("DROP TABLE rdb.APP.CAT_OVW2")
  }

  test("catalog aggregate pushdown composes (COUNT through SQL)") {
    val df = spark.sql("SELECT count(*) AS n FROM rdb.APP.NATION")
    assert(df.collect().head.getLong(0) == 10)
    assert(df.queryExecution.executedPlan.toString
      .contains("PushedAggregates: true"))
  }

  test("catalog SQL join collapses into one remote query (join pushdown)") {
    spark.conf.set("spark.sql.optimizer.datasourceV2JoinPushdown", "true")
    try {
      val df = spark.sql(
        """SELECT n.N_NAME, count(*) AS n_rows
          |FROM rdb.APP.NATION n JOIN rdb.APP.NATION r
          |  ON n.N_REGIONKEY = r.N_REGIONKEY
          |GROUP BY n.N_NAME ORDER BY n.N_NAME""".stripMargin)
      // 10 nations, 2 per region -> each joins to 2 rows of its region
      val rows = df.collect()
      assert(rows.length == 10 && rows.forall(_.getLong(1) == 2))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
        s"catalog join should push to the remote DB: $plan")
    } finally spark.conf.unset("spark.sql.optimizer.datasourceV2JoinPushdown")
  }

  test("ALTER TABLE ADD/DROP COLUMN ships as remote DDL") {
    spark.sql("DROP TABLE IF EXISTS rdb.APP.CAT_ALTER")
    spark.sql("CREATE TABLE rdb.APP.CAT_ALTER (ID BIGINT, NAME STRING)")
    spark.sql("INSERT INTO rdb.APP.CAT_ALTER VALUES (1, 'a')")
    spark.sql("ALTER TABLE rdb.APP.CAT_ALTER ADD COLUMN SCORE DOUBLE")
    // the new column is immediately remote-real: writable and readable
    spark.sql("INSERT INTO rdb.APP.CAT_ALTER VALUES (2, 'b', 1.5)")
    val back = spark.sql(
      "SELECT ID, SCORE FROM rdb.APP.CAT_ALTER ORDER BY ID").collect()
    assert(back.length == 2 && back(0).isNullAt(1) &&
      back(1).getDouble(1) == 1.5)
    spark.sql("ALTER TABLE rdb.APP.CAT_ALTER DROP COLUMN NAME")
    val cols = spark.table("rdb.APP.CAT_ALTER").schema.fieldNames.toSeq
    assert(cols.map(_.toUpperCase) == Seq("ID", "SCORE"))
    spark.sql("DROP TABLE rdb.APP.CAT_ALTER")
  }

  test("RENAME TABLE ships as remote DDL (Derby RENAME TABLE spelling)") {
    spark.sql("DROP TABLE IF EXISTS rdb.APP.CAT_RN1")
    spark.sql("DROP TABLE IF EXISTS rdb.APP.CAT_RN2")
    spark.sql("CREATE TABLE rdb.APP.CAT_RN1 (ID BIGINT)")
    spark.sql("INSERT INTO rdb.APP.CAT_RN1 VALUES (7)")
    spark.sql("ALTER TABLE rdb.APP.CAT_RN1 RENAME TO CAT_RN2")
    val back = spark.sql("SELECT ID FROM rdb.APP.CAT_RN2").collect()
    assert(back.map(_.getLong(0)).toSeq == Seq(7L))
    // the old name is gone on the REMOTE, not just in Spark's view
    assert(!spark.sql("SHOW TABLES IN rdb.APP").select("tableName")
      .collect().map(_.getString(0)).contains("CAT_RN1"))
    spark.sql("DROP TABLE rdb.APP.CAT_RN2")
  }

  test("unsupported DDL change classes still fail loudly") {
    spark.sql("DROP TABLE IF EXISTS rdb.APP.CAT_ALTER2")
    spark.sql("CREATE TABLE rdb.APP.CAT_ALTER2 (ID BIGINT)")
    try intercept[Exception] {
      // column type change: engine-divergent semantics, rejected
      spark.sql("ALTER TABLE rdb.APP.CAT_ALTER2 ALTER COLUMN ID TYPE STRING")
    } finally spark.sql("DROP TABLE rdb.APP.CAT_ALTER2")
  }
}
