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

  def unionAll(a: DataFrame, b: DataFrame): DataFrame = unionAll(Seq(a, b))

  /** N-way form (the 12-monthly-shards case): all inputs merge into
    * ONE FLAT `SELECT … UNION ALL SELECT … UNION ALL …` remote query —
    * not a left-fold of pairwise merges, which would nest each step's
    * result as an ever-deeper subquery.
    *
    * Note: user-specified read schemas (`.schema(...)` on a side's
    * reader) are NOT carried into the merged scan — the merged query's
    * schema is re-inferred remotely; declare shaping via
    * `structcol.*` options (checked for parity across sides) instead. */
  def unionAll(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "RemoteUnion.unionAll: no inputs")
    if (dfs.length == 1) return dfs.head
    val spark = dfs.head.sparkSession
    val sides = dfs.zipWithIndex.map { case (df, i) =>
      bareTable(df.queryExecution.analyzed).getOrElse(
        throw new IllegalArgumentException(
          s"RemoteUnion.unionAll: input $i is not a bare graft-remote scan"))
    }
    val (ta, _) = sides.head
    // redacted URLs in the error: JDBC urls routinely carry
    // credentials in query params (user=…&password=…) and require
    // messages land in logs
    def redact(u: String): String = u.takeWhile(c => c != '?' && c != ';')
    // schema-shaping options must AGREE: behavior options ride from the
    // first side only, so another side's transform/structcol would be
    // silently dropped (or the first's applied to that side's rows)
    def shaping(m: Map[String, String]): Map[String, String] =
      m.filter { case (k, _) =>
        val lk = k.toLowerCase
        lk == "transformclass" || lk.startsWith("structcol.")
      }
    val dialect = ta.opts.dialect
    val typesA = dfs.head.schema.fields.map(_.dataType).toSeq
    sides.zip(dfs).zipWithIndex.foreach { case (((tb, _), df), i) =>
      require(ta.opts.url == tb.opts.url,
        s"RemoteUnion.unionAll: different databases (${redact(ta.opts.url)} " +
          s"vs input $i ${redact(tb.opts.url)}) — a cross-database union " +
          "stays Spark-side")
      require(shaping(ta.opts.map) == shaping(tb.opts.map),
        "RemoteUnion.unionAll: transformclass/structcol.* options differ " +
          s"between sides (${shaping(ta.opts.map)} vs input $i " +
          s"${shaping(tb.opts.map)}) — shaping rides from the first side " +
          "only and would silently misapply; align the options or union " +
          "Spark-side")
      require(!tb.isCommand,
        "RemoteUnion.unionAll: command sources have no SQL form")
      require(dialect.isRewritable(tb.opts.source),
        "RemoteUnion.unionAll: non-SELECT query source cannot be merged")
      val typesB = df.schema.fields.map(_.dataType).toSeq
      require(typesA == typesB,
        s"RemoteUnion.unionAll: positional column types differ " +
          s"($typesA vs input $i $typesB)")
    }
    // explicit per-side SELECT lists pin positional alignment — a `*`
    // would silently re-pair columns if one table's DDL order drifts
    val merged = sides.map { case (tb, cols) =>
      dialect.rewriteQuery(tb.opts.source, columns = Some(cols))
    }.mkString(" UNION ALL ")
    // connection/behavior options ride from the FIRST side; the source
    // options are replaced by the merged query
    val base = ta.opts.map - "dbtable" - "query"
    var r = spark.read.format("graft-remote")
    (base + ("query" -> merged)).foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }
}
