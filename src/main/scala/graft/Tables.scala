package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loads the driver-generated parquet fixtures (see TESTDATA.md) and
  * registers them as temp views so both the DataFrame API and
  * `spark.sql` queries can address them by name.
  *
  * Mirrors the reference's registration step
  * (`integration-tests/src/utils.rs:24` — `ctx.register_table`), with
  * parquet standing in for the remote databases.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one fixture table. Filters/projections above this pushdown to
    * the parquet scan (verify with .explain: PushedFilters / ReadSchema).
    *
    * `events.ts` has shipped in two encodings across fixture
    * generations, both normalized here to a session-tz TimestampType so
    * every downstream query (`unix_micros`, watermarks, as-of joins)
    * sees one type:
    *   - TIMESTAMP(NANOS): Spark's vectorized reader rejects it; read
    *     as raw Long (nanosAsLong) and rebuild microseconds with exact
    *     integer division (`div` — a double round-trip would lose
    *     precision at ~1.7e18 ns).
    *   - timestamp[us] with no timezone: Spark reads TIMESTAMP_NTZ,
    *     which `unix_micros` rejects at analysis. Cast to TimestampType;
    *     under the UTC session timezone all harnesses use, the epoch
    *     micros are bit-identical to the DuckDB oracle's epoch_us.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          df("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    } else df
  }

  /** Register every fixture as a temp view named after the table. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
