package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** UNION ALL pushdown across remote tables of the SAME database — the
  * federation pattern for remotes that shard one logical dataset over
  * several physical tables (monthly partitions, per-tenant tables).
  * `df_a.unionAll(df_b)` would pull BOTH tables into Spark and union
  * there; this collapses the two scans into ONE remote query
  * (`SELECT … FROM a UNION ALL SELECT … FROM b`), so downstream
  * filters/limits/aggregates push into the combined query through the
  * normal subquery-wrapping machinery (reference
  * `connection/mod.rs:336-380`) and the remote sees one round trip.
  *
  * Deliberately an EXPLICIT API rather than a Catalyst rule: a
  * `Union(relA, relB)` logical match races the optimizer's own
  * push-through-union rewrites inside the fixpoint batch (whether the
  * relations are still bare when the rule fires depends on rule order),
  * whereas the explicit form is deterministic and self-documenting at
  * the call site. Spark's DSv2 has no `SupportsPushDownUnion` hook to
  * do this declaratively (join pushdown got one; union has not).
  *
  * Safety rules (each violation throws — silently falling back would
  * hide a plan regression the caller asked for):
  *   - both inputs must be BARE `graft-remote` scans (no
  *     filter/projection applied yet — push those AFTER the union, on
  *     the merged frame, where they reach the remote anyway),
  *   - same JDBC url (one database executes the merged SQL),
  *   - both sources rewritable (SELECT-shaped),
  *   - positionally identical column types (UNION ALL is positional;
  *     names come from the FIRST side, as in SQL).
  */
object RemoteUnion {

  private def bareTable(plan: LogicalPlan): Option[(RemoteTableImpl, Seq[String])] =
    plan match {
      case s: SubqueryAlias => bareTable(s.child)
      case r: DataSourceV2Relation => r.table match {
        case t: RemoteTableImpl => Some((t, r.output.map(_.name)))
        case _ => None
      }
      case _ => None
    }

  def unionAll(a: DataFrame, b: DataFrame): DataFrame = {
    val spark = a.sparkSession
    val (ta, colsA) = bareTable(a.queryExecution.analyzed).getOrElse(
      throw new IllegalArgumentException(
        "RemoteUnion.unionAll: left input is not a bare graft-remote scan"))
    val (tb, colsB) = bareTable(b.queryExecution.analyzed).getOrElse(
      throw new IllegalArgumentException(
        "RemoteUnion.unionAll: right input is not a bare graft-remote scan"))
    // redacted URLs in the error: JDBC urls routinely carry
    // credentials in query params (user=…&password=…) and require
    // messages land in logs
    def redact(u: String): String = u.takeWhile(c => c != '?' && c != ';')
    require(ta.opts.url == tb.opts.url,
      s"RemoteUnion.unionAll: different databases (${redact(ta.opts.url)} " +
        s"vs ${redact(tb.opts.url)}) — a cross-database union stays " +
        "Spark-side")
    // schema-shaping options must AGREE: behavior options ride from the
    // left side only, so a right-side transform/structcol would be
    // silently dropped (or the left's applied to the right's rows)
    def shaping(m: Map[String, String]): Map[String, String] =
      m.filter { case (k, _) =>
        val lk = k.toLowerCase
        lk == "transformclass" || lk.startsWith("structcol.")
      }
    require(shaping(ta.opts.map) == shaping(tb.opts.map),
      "RemoteUnion.unionAll: transformclass/structcol.* options differ " +
        s"between sides (${shaping(ta.opts.map)} vs ${shaping(tb.opts.map)}) " +
        "— shaping rides from the left side only and would silently " +
        "misapply; align the options or union Spark-side")
    require(!ta.isCommand && !tb.isCommand,
      "RemoteUnion.unionAll: command sources have no SQL form")
    val dialect = ta.opts.dialect
    require(dialect.isRewritable(ta.opts.source) &&
      dialect.isRewritable(tb.opts.source),
      "RemoteUnion.unionAll: non-SELECT query source cannot be merged")
    val typesA = a.schema.fields.map(_.dataType).toSeq
    val typesB = b.schema.fields.map(_.dataType).toSeq
    require(typesA == typesB,
      s"RemoteUnion.unionAll: positional column types differ " +
        s"($typesA vs $typesB)")
    // explicit per-side SELECT lists pin positional alignment — a `*`
    // would silently re-pair columns if one table's DDL order drifts
    val sqlA = dialect.rewriteQuery(ta.opts.source, columns = Some(colsA))
    val sqlB = dialect.rewriteQuery(tb.opts.source, columns = Some(colsB))
    val merged = s"$sqlA UNION ALL $sqlB"
    // connection/behavior options ride from the LEFT side; the source
    // options are replaced by the merged query
    val base = ta.opts.map - "dbtable" - "query"
    var r = spark.read.format("graft-remote")
    (base + ("query" -> merged)).foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }
}
