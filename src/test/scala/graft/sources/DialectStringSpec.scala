package graft.sources

import org.apache.spark.sql.sources.{EqualTo, GreaterThan}
import org.scalatest.funsuite.AnyFunSuite

/** SQL-string tests that keep the DM / MDB / GaussDB dialect rules alive
  * without their (unavailable) JDBC drivers — the same role the
  * reference's unit tests on `RemoteDbType` play. */
class DialectStringSpec extends AnyFunSuite {

  private val table = RemoteSource.TableRef(Seq("S", "T"))
  private val query = RemoteSource.Query("SELECT a, b FROM t")

  test("DM: ANSI quoting, HEXTORAW binary, LIMIT rewrites") {
    assert(DmDialect.quote("c") == "\"c\"")
    assert(DmDialect.binaryLiteral(Array[Byte](0x0a, 0x2f)) == "HEXTORAW('0a2f')")
    assert(DmDialect.rewriteQuery(table, Seq("\"a\" > 1"), Some(5)) ==
      """SELECT * FROM "S"."T" WHERE ("a" > 1) LIMIT 5""")
    assert(Dialect.forName("dm") == DmDialect)
    assert(Dialect.forUrl("jdbc:dm://host:5236") == DmDialect)
  }

  test("GaussDB: postgres-family binary literal and LIMIT") {
    assert(GaussDbDialect.binaryLiteral(Array[Byte](0x0a)) == "E'\\\\x0a'")
    assert(GaussDbDialect.rewriteQuery(query, Nil, Some(3)) ==
      "SELECT * FROM (SELECT a, b FROM t) AS __subquery LIMIT 3")
    assert(Dialect.forName("opengauss") == GaussDbDialect)
  }

  test("MDB: bracket quoting with ]] escape") {
    assert(MdbDialect.quote("col") == "[col]")
    assert(MdbDialect.quote("we]ird") == "[we]]ird]")
    assert(MdbDialect.tableName(Seq("db", "tbl")) == "[db].[tbl]")
  }

  test("MDB: query sources are never rewritable (tables only)") {
    assert(MdbDialect.isRewritable(table))
    assert(!MdbDialect.isRewritable(query))
    assert(!MdbDialect.isRewritable(RemoteSource.Query("select * from x")))
  }

  test("MDB: WHERE strips outer paren chars and never adds new ones") {
    val sql = MdbDialect.rewriteQuery(table,
      Seq("([a] > 1)", "[b] = 'x'"), Some(2))
    assert(sql == "SELECT * FROM [S].[T] WHERE [a] > 1 AND [b] = 'x' LIMIT 2")
  }

  test("MDB: compiled filters land unparenthesized in the WHERE clause") {
    val f1 = MdbDialect.compileFilter(GreaterThan("a", 1), identity).get
    val f2 = MdbDialect.compileFilter(EqualTo("b", "x"), identity).get
    val sql = MdbDialect.rewriteQuery(table, Seq(f1, f2), None)
    assert(!sql.contains("("), s"parenthesized WHERE leaked through: $sql")
    assert(sql.contains(" WHERE ") && sql.contains(" AND "))
  }

  test("Postgres: information_schema inference SQL detects identity + nextval") {
    val sql = PostgresDialect.catalogInferenceSql("public", "users")
    assert(sql.contains("is_identity = 'YES'"))
    assert(sql.contains("column_default LIKE 'nextval(%'"))
    assert(sql.contains("table_schema = 'public'"))
    assert(sql.contains("ORDER BY ordinal_position"))
  }

  test("MDB: paren-requiring filters (OR / IN / NOT) are declined") {
    import org.apache.spark.sql.sources.{EqualNullSafe, In, Not, Or}
    // MDB joins pushed filters with bare AND and strips parens; pushing
    // an OR would silently change AND/OR precedence ('(a) OR (b) AND c'),
    // and IN/NOT cannot render paren-free — so those decline and Spark
    // re-evaluates them post-scan.
    assert(MdbDialect.compileFilter(Or(EqualTo("a", 1), EqualTo("b", 2)), identity).isEmpty)
    assert(MdbDialect.compileFilter(In("a", Array(1, 2)), identity).isEmpty)
    assert(MdbDialect.compileFilter(Not(EqualTo("a", 1)), identity).isEmpty)
    // null-safe equality renders as a pure AND conjunction since the
    // 3VL-total rewrite — paren-free, so MDB can push it safely
    assert(MdbDialect.compileFilter(EqualNullSafe("a", 1), identity)
      .contains("[a] = 1 AND [a] IS NOT NULL"))
    // empty IN renders paren-free ('1 = 0') and null-safe-vs-null is IS NULL
    assert(MdbDialect.compileFilter(In("a", Array.empty[Any]), identity).contains("1 = 0"))
    assert(MdbDialect.compileFilter(EqualNullSafe("a", null), identity)
      .contains("[a] IS NULL"))
  }

  test("MDB: AND of paren-free sides pushes with bare AND; OR side poisons it") {
    import org.apache.spark.sql.sources.{And, Or}
    val and = MdbDialect.compileFilter(
      And(GreaterThan("a", 1), EqualTo("b", "x")), identity).get
    assert(and == "[a] > 1 AND [b] = 'x'", s"got: $and")
    assert(!and.contains("("))
    // an OR anywhere inside the conjunction cannot render safely
    assert(MdbDialect.compileFilter(
      And(GreaterThan("a", 1), Or(EqualTo("b", 2), EqualTo("c", 3))),
      identity).isEmpty)
  }

  test("MDB: no COUNT(1) statistics (reference try_count1_query => None)") {
    assert(!MdbDialect.supportsCountStatistics)
    assert(DmDialect.supportsCountStatistics && GaussDbDialect.supportsCountStatistics)
  }

  test("upsert SQL per dialect: ANSI MERGE / ON DUPLICATE KEY / ON CONFLICT / MDB reject") {
    val t = Seq("S", "T"); val g = Seq("S", "G")
    val keys = Seq("K"); val upd = Seq("V"); val all = Seq("K", "V")
    // ANSI family (Derby, Postgres, GaussDB, DM, Oracle): one MERGE
    val ansi = DerbyDialect.mergeSql(t, g, keys, upd, all)
    assert(ansi.startsWith("MERGE INTO ") &&
      ansi.contains("WHEN MATCHED THEN UPDATE SET \"V\" = S.\"V\"") &&
      ansi.contains("WHEN NOT MATCHED THEN INSERT (\"K\", \"V\")"), ansi)
    assert(GaussDbDialect.mergeSql(t, g, keys, upd, all).contains("MERGE INTO"))
    // all-keys batches drop the MATCHED branch (insert-if-absent)
    assert(!DerbyDialect.mergeSql(t, g, all, Nil, all).contains("WHEN MATCHED"))
    // MySQL: INSERT .. ON DUPLICATE KEY UPDATE (unique-key contract)
    val my = MySqlDialect.mergeSql(t, g, keys, upd, all)
    assert(my.startsWith("INSERT INTO `S`.`T`") &&
      my.contains("ON DUPLICATE KEY UPDATE `V` = S.`V`"), my)
    assert(MySqlDialect.mergeSql(t, g, all, Nil, all).startsWith("INSERT IGNORE"))
    // SQLite: ON CONFLICT upsert with the WHERE true disambiguator
    val sq = SqliteDialect.mergeSql(t, g, keys, upd, all)
    assert(sq.contains("WHERE true ON CONFLICT(\"K\") DO UPDATE SET " +
      "\"V\" = excluded.\"V\""), sq)
    assert(SqliteDialect.mergeSql(t, g, all, Nil, all).contains("DO NOTHING"))
    // MDB: no upsert statement exists — loud reject
    val e = intercept[UnsupportedOperationException] {
      MdbDialect.mergeSql(t, g, keys, upd, all)
    }
    assert(e.getMessage.contains("mergekeys"))
  }
}
