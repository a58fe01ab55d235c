package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Transform => PartitionTransform}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DSv2 `TableCatalog` over one remote database — the Spark-catalog
  * form of the reference's `ctx.register_table(...)` federation setup
  * (`integration-tests/src/utils.rs:23-39`), lifted from "register each
  * table by hand" to "mount the whole database":
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.rdb", "graft.sources.GraftCatalog")
  * spark.conf.set("spark.sql.catalog.rdb.url", "jdbc:derby:/tmp/db")
  * spark.sql("SELECT * FROM rdb.APP.NATION")       // federated scan
  * spark.sql("SHOW TABLES IN rdb.APP")
  * spark.sql("CREATE TABLE rdb.APP.T (id BIGINT, name STRING)")
  * spark.sql("INSERT INTO rdb.APP.T SELECT ...")   // connector write path
  * }}}
  *
  * Namespaces are remote schemas (via `DatabaseMetaData.getSchemas`),
  * tables resolve lazily to [[RemoteTableImpl]] (schema inference runs
  * once per `loadTable`, driver-side, like the reference's
  * `RemoteTable::try_new`), and every option set under
  * `spark.sql.catalog.<name>.*` (fetchsize, dialect, credentials...)
  * flows into each table. CREATE TABLE renders dialect DDL from the
  * Spark schema; REPLACE/ALTER/RENAME are rejected like the
  * reference's overwrite path (`table.rs:434-441`).
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var baseOptions: Map[String, String] = Map.empty

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    baseOptions = options.asCaseSensitiveMap().asScala.toMap
    require(baseOptions.contains("url"),
      s"catalog $name needs spark.sql.catalog.$name.url")
  }

  override def name(): String = catalogName

  private def opts(extra: (String, String)*): RemoteOptions =
    RemoteOptions((baseOptions -- Seq("dbtable", "query", "command")) ++ extra)

  private def withConnection[A](f: java.sql.Connection => A): A = {
    val conn = GraftConnections.open(opts())
    try f(conn) finally GraftConnections.close(conn)
  }

  private def tableRef(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(".")

  // ---- tables -----------------------------------------------------------

  /** `DatabaseMetaData.getTables` treats its schema/table arguments as
    * JDBC LIKE patterns — a lookup for `MY_TABLE` also matches
    * `MYXTABLE`. Escaping is driver-dependent (Derby declares NO
    * search-string escape at all), so the pattern is only narrowed
    * when the driver declares an escape, and matches are ALWAYS
    * post-filtered by exact name: LIKE can overmatch but never
    * undermatch a literal identifier, so exact filtering is complete. */
  private def likeEscape(conn: java.sql.Connection, ident: String): String = {
    val esc = conn.getMetaData.getSearchStringEscape
    if (esc == null || esc.isEmpty) ident
    else ident.replace(esc, esc + esc)
      .replace("_", esc + "_")
      .replace("%", esc + "%")
  }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    withConnection { conn =>
      val wantSchema = if (namespace.isEmpty) null else namespace.mkString(".")
      // "BASE TABLE": DuckDB's JDBC metadata reports the SQL-standard
      // type string, not Derby/Postgres' "TABLE" — a type filter that
      // omits it silently lists nothing (the r29 lesson; the same
      // family of quirk as the reference's MSys* filtering in
      // connection/mdb/mod.rs:352-517)
      val rs = conn.getMetaData.getTables(null,
        if (wantSchema == null) null else likeEscape(conn, wantSchema), "%",
        Array("TABLE", "BASE TABLE", "VIEW"))
      val out = Seq.newBuilder[Identifier]
      while (rs.next()) {
        val schem = rs.getString("TABLE_SCHEM")
        if (wantSchema == null || wantSchema.equalsIgnoreCase(schem))
          out += Identifier.of(Option(schem).toArray, rs.getString("TABLE_NAME"))
      }
      rs.close()
      out.result().toArray
    }

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchTableException((ident.namespace() :+ ident.name()).toSeq)
    new RemoteTableImpl(opts("dbtable" -> tableRef(ident)), None)
  }

  override def tableExists(ident: Identifier): Boolean =
    withConnection { conn =>
      val wantSchema = if (ident.namespace().isEmpty) null
        else ident.namespace().mkString(".")
      val rs = conn.getMetaData.getTables(null,
        if (wantSchema == null) null else likeEscape(conn, wantSchema),
        likeEscape(conn, ident.name()),
        Array("TABLE", "BASE TABLE", "VIEW"))
      // exact-compare per character but case-insensitively: wildcard
      // overmatches (MY_TABLE vs MYXTABLE) are filtered out, while
      // case-folding backends (getTables matching 'nation' to stored
      // 'NATION') still report the table as existing
      var found = false
      while (!found && rs.next())
        found = rs.getString("TABLE_NAME").equalsIgnoreCase(ident.name()) &&
          (wantSchema == null ||
            wantSchema.equalsIgnoreCase(rs.getString("TABLE_SCHEM")))
      rs.close()
      found
    }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[PartitionTransform],
      properties: java.util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "remote tables do not support partition transforms")
    val o = opts("dbtable" -> tableRef(ident))
    val d = o.dialect
    val cols = schema.fields.map { f =>
      val nn = if (f.nullable) "" else " NOT NULL"
      s"${d.quote(f.name)} ${d.ddlType(f.dataType)}$nn"
    }
    val parts = ident.namespace() :+ ident.name()
    val ddl = s"CREATE TABLE ${d.tableName(parts)} (${cols.mkString(", ")})"
    withConnection { conn =>
      val st = conn.createStatement()
      try st.executeUpdate(ddl) finally st.close()
    }
    new RemoteTableImpl(o, Some(schema))
  }

  /** ALTER TABLE as remote DDL: ADD COLUMN and DROP COLUMN ship as one
    * dialect statement each (the schema lives on the REMOTE — there is
    * nothing Spark-side to alter). Other change classes (type changes,
    * renames-within-table, property edits) have engine-divergent
    * semantics and fail loudly rather than guessing. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val d = opts().dialect
    val parts = ident.namespace() :+ ident.name()
    val stmts = changes.map {
      case a: TableChange.AddColumn =>
        require(a.fieldNames().length == 1,
          "remote ALTER TABLE cannot add nested fields")
        val nn = if (a.isNullable) "" else " NOT NULL"
        s"ALTER TABLE ${d.tableName(parts)} ADD COLUMN " +
          s"${d.quote(a.fieldNames().head)} ${d.ddlType(a.dataType())}$nn"
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames().length == 1,
          "remote ALTER TABLE cannot drop nested fields")
        s"ALTER TABLE ${d.tableName(parts)} DROP COLUMN " +
          s"${d.quote(del.fieldNames().head)}"
      case other => throw new UnsupportedOperationException(
        s"graft catalog: unsupported ALTER TABLE change $other " +
          "(ADD COLUMN / DROP COLUMN only)")
    }
    withConnection { conn =>
      val st = conn.createStatement()
      try stmts.foreach(st.executeUpdate) finally st.close()
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    if (!tableExists(ident)) return false
    val d = opts().dialect
    withConnection { conn =>
      val st = conn.createStatement()
      try st.executeUpdate(
        s"DROP TABLE ${d.tableName(ident.namespace() :+ ident.name())}")
      finally st.close()
    }
    true
  }

  /** RENAME TABLE as remote DDL (dialect spelling: Derby `RENAME
    * TABLE`, most others `ALTER TABLE .. RENAME TO`). Cross-schema
    * moves are not a rename in any engine — rejected. */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    // Spark hands RENAME targets through with whatever qualification
    // the user typed (often none) — an EMPTY namespace means "same
    // schema"; anything else must match the source schema
    require(newIdent.namespace().isEmpty ||
      oldIdent.namespace().toSeq == newIdent.namespace().toSeq,
      "graft catalog: RENAME TABLE cannot move tables across schemas")
    if (!tableExists(oldIdent))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        oldIdent)
    val d = opts().dialect
    val sql = d.renameTableSql(
      oldIdent.namespace() :+ oldIdent.name(), newIdent.name())
    withConnection { conn =>
      val st = conn.createStatement()
      try st.executeUpdate(sql) finally st.close()
    }
  }

  // ---- namespaces (remote schemas) ---------------------------------------

  override def listNamespaces(): Array[Array[String]] =
    withConnection { conn =>
      val rs = conn.getMetaData.getSchemas
      val out = Seq.newBuilder[Array[String]]
      while (rs.next()) out += Array(rs.getString("TABLE_SCHEM"))
      rs.close()
      out.result().toArray
    }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else Array.empty // remote schemas are one level deep

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 &&
      listNamespaces().exists(_.sameElements(namespace))

  override def loadNamespaceMetadata(namespace: Array[String])
      : java.util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchNamespaceException(namespace.toSeq)
    java.util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: CREATE NAMESPACE is not supported")

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: ALTER NAMESPACE is not supported")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException(
      "graft catalog: DROP NAMESPACE is not supported")
}
