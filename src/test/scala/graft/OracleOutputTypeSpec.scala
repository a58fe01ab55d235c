package graft

import org.scalatest.funsuite.AnyFunSuite

/** Oracle-output TYPING lint (round-11 verdict item 2).
  *
  * The round-11 reds (p81, r34) were not value bugs: both gates were
  * value-exact, but their oracle SQL produced DuckDB HUGEINT / int128-
  * backed DECIMAL(38,0) result columns, which the driver's hash
  * canonicalizer treats as a different type from Spark's int64 — so the
  * builder-side exact-value checker passed what the driver's hash
  * failed. The gate-authoring rule this pins: **no oracle output column
  * may be HUGEINT/UHUGEINT or DECIMAL with precision > 18** (beyond
  * int64, i.e. int128-backed in DuckDB). Aggregates must be cast to
  * BIGINT/DOUBLE and extreme decimals routed through VARCHAR for the
  * hashed surface (typed assertions stay in engine specs, e.g.
  * DuckDbSourceSpec's DECIMAL(38,0) clamp38 reads).
  *
  * Mechanism: every `SparkEntry.oracleSql` entry is `DESCRIBE`d in an
  * in-memory DuckDB over the sf0.001 parquet views — bind/plan only, no
  * execution, so linting all ~200 gates is sub-second. Reintroducing
  * p81's pre-fix `sum(freq)` (un-cast) fails this spec before any
  * artifact is cut.
  */
class OracleOutputTypeSpec extends AnyFunSuite {

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  // int128-backed types the driver's hash canonicalizer cannot be
  // trusted with: HUGEINT/UHUGEINT and any DECIMAL wider than int64.
  private def offending(colType: String): Boolean = {
    val t = colType.trim.toUpperCase
    t.startsWith("HUGEINT") || t.startsWith("UHUGEINT") || {
      val m = """DECIMAL\((\d+)\s*,\s*\d+\)""".r.findFirstMatchIn(t)
      m.exists(_.group(1).toInt > 18)
    }
  }

  test("no oracle result column is HUGEINT or DECIMAL(p>18) " +
      "(driver hash-canonicalizer exact domain)") {
    assume(DuckQueries.available, "duckdb_jdbc jar not vendored")
    val sf = "/root/testdata/sf0.001"
    val con = java.sql.DriverManager.getConnection("jdbc:duckdb:")
    try {
      val st = con.createStatement()
      tables.foreach { t =>
        st.execute(s"CREATE VIEW $t AS SELECT * FROM '$sf/$t.parquet'")
      }
      val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
        case (name, sql) =>
          val rs = st.executeQuery(s"DESCRIBE $sql")
          val cols = Iterator.continually(rs)
            .takeWhile(_.next())
            .map(r => (r.getString("column_name"), r.getString("column_type")))
            .toList
          rs.close()
          cols.collect {
            case (c, t) if offending(t) => s"$name.$c: $t"
          }
      }
      st.close()
      assert(bad.isEmpty,
        "oracle output columns outside the driver hasher's exact domain " +
          "(cast sums to BIGINT/DOUBLE; route wide decimals through " +
          s"VARCHAR): ${bad.mkString("; ")}")
    } finally con.close()
  }
}
