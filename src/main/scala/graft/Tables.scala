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
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; we read it as a raw Long (nanosAsLong) and rebuild
    * a microsecond TimestampType column with exact integer division
    * (`div` — a double round-trip would lose precision at ~1.7e18 ns).
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }

  /** Register every fixture as a temp view named after the table. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
