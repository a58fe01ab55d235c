package graft

import java.sql.DriverManager

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reproduction of the reference's only benchmark harness
  * (`benchmarks/src/bin/postgres.rs`): insert 1,000,000 rows of the
  * 6-column mixed schema (INT, FLOAT8, BYTEA ~200B, TEXT ~200B,
  * JSON ~64B, TIMESTAMP) through the connector, then scan them all
  * back, printing wall-clock ms for each. Embedded Derby stands in for
  * the Postgres server (BASELINE.md context).
  *
  * Run: ROWS=1000000 sbt "runMain graft.ConnectorBench"
  */
object ConnectorBench {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("ROWS", "1000000").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")

    val db = s"/tmp/graft_bench_db_${System.nanoTime()}"
    val url = s"jdbc:derby:$db;create=true"
    val c = DriverManager.getConnection(url)
    c.createStatement().executeUpdate(
      """CREATE TABLE bench_t (
        | c_int INT, c_double DOUBLE, c_bytes BLOB(1K),
        | c_text VARCHAR(512), c_json VARCHAR(256), c_ts TIMESTAMP)""".stripMargin)
    c.close()

    // deterministic synthetic payload matching the reference's shapes
    val df = spark.range(rows.toLong).select(
      col("id").cast(IntegerType).as("C_INT"),
      (col("id") * 0.001).as("C_DOUBLE"),
      expr("unhex(repeat('AB', 200))").as("C_BYTES"),
      concat(lit("text_payload_" * 12), col("id")).as("C_TEXT"),
      concat(lit("""{"k":"v","n":"""), col("id"), lit("}")).as("C_JSON"),
      timestamp_micros(col("id") * 1000000L).as("C_TS"))

    val t0 = System.nanoTime()
    // default bounded pool (10): Derby's single writer lock thrashes
    // with more concurrent writers, so capping below the 32 tasks is
    // measured as fast or faster than 32 unpooled connections.
    // WRITE_PARTITIONS exercises the writepartitions option (write
    // concurrency capped through the sink's distribution contract) —
    // BASELINE.md records the insert time at several caps.
    val writeOpts = sys.env.get("WRITE_PARTITIONS")
      .map(n => Map("writepartitions" -> n)).getOrElse(Map.empty)
    df.write.format("graft-remote").option("url", url)
      .option("dbtable", "BENCH_T").option("batchsize", "1000")
      .options(writeOpts)
      .mode("append").save()
    val insertMs = (System.nanoTime() - t0) / 1e6

    val t1 = System.nanoTime()
    val n = spark.read.format("graft-remote").option("url", url)
      .option("dbtable", "BENCH_T").load()
      .agg(count(lit(1))).collect().head.getLong(0)
    val countMs = (System.nanoTime() - t1) / 1e6

    // 2-column scan (column pruning reaches the remote SELECT list)
    val t2 = System.nanoTime()
    val n2 = spark.read.format("graft-remote").option("url", url)
      .option("dbtable", "BENCH_T").load()
      .agg(count(col("C_TEXT")), sum(col("C_DOUBLE"))).collect().head.getLong(0)
    val scanMs = (System.nanoTime() - t2) / 1e6

    // full-width scan: every column referenced => full decode (the
    // reference's SELECT * shape)
    val t3 = System.nanoTime()
    val n3 = spark.read.format("graft-remote").option("url", url)
      .option("dbtable", "BENCH_T").load()
      .agg(count(col("C_INT")), sum(col("C_DOUBLE")),
        max(length(col("C_TEXT"))), max(octet_length(col("C_BYTES"))),
        max(length(col("C_JSON"))), max(col("C_TS")))
      .collect().head.getLong(0)
    val fullScanMs = (System.nanoTime() - t3) / 1e6

    // sampled full-width scan: TABLESAMPLE pushdown (r18) — only ~5%
    // of rows cross the wire; the wall-clock vs full_scan_ms IS the
    // wire-proportionality evidence for the pushed sample
    val t4 = System.nanoTime()
    val n4 = spark.read.format("graft-remote").option("url", url)
      .option("dbtable", "BENCH_T").option("samplecolumn", "C_INT").load()
      .sample(withReplacement = false, fraction = 0.05, seed = 11L)
      .agg(count(col("C_INT")), sum(col("C_DOUBLE")),
        max(length(col("C_TEXT"))), max(octet_length(col("C_BYTES"))),
        max(length(col("C_JSON"))), max(col("C_TS")))
      .collect().head.getLong(0)
    val sampleScanMs = (System.nanoTime() - t4) / 1e6

    // scalar-fn filter pushdown (r19): `SUBSTRING(C_JSON, 1, 1) = '{'
    // AND C_INT < rows/20` ships as remote WHERE SQL — only ~5% of
    // full-width rows cross the wire. The same query with pushdown
    // impossible (filter on a fn of a fetched value Spark must compute)
    // would pay full_scan_ms; fn_filter_scan_ms vs full_scan_ms is the
    // wire-savings evidence for the whitelist path.
    val t5 = System.nanoTime()
    val n5 = spark.read.format("graft-remote").option("url", url)
      .option("dbtable", "BENCH_T").load()
      .filter(substring(col("C_JSON"), 1, 1) === "{" &&
        col("C_INT") < rows / 20)
      .agg(count(col("C_INT")), sum(col("C_DOUBLE")),
        max(length(col("C_TEXT"))), max(octet_length(col("C_BYTES"))),
        max(length(col("C_JSON"))), max(col("C_TS")))
      .collect().head.getLong(0)
    val fnFilterMs = (System.nanoTime() - t5) / 1e6

    require(n == rows && n2 == rows && n3 == rows,
      s"row count mismatch: $n / $n2 / $n3 != $rows")
    require(n4 > 0 && n4 < rows, s"sampled scan returned $n4 of $rows rows")
    require(n5 == rows / 20, s"fn-filter scan returned $n5 of ${rows / 20}")
    println(s"""{"rows":$rows,"insert_ms":$insertMs,"count_pushdown_ms":$countMs,"scan2col_ms":$scanMs,"full_scan_ms":$fullScanMs,"sample5pct_rows":$n4,"sample5pct_scan_ms":$sampleScanMs,"fn_filter_rows":$n5,"fn_filter_scan_ms":$fnFilterMs}""")
    spark.stop()
    // embedded Derby DBs are ~1 GB at 1M rows; don't accrete in /tmp
    graft.sources.GraftConnectionPool.drainAll()
    try DriverManager.getConnection(s"jdbc:derby:$db;shutdown=true")
    catch { case _: java.sql.SQLException => () } // XJ015/08006 = clean shutdown
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(db))
  }
}
