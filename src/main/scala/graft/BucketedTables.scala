package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Bucketed (pre-shuffled) table layout: the storage-side answer to
  * join shuffles. Writing both fact tables bucketed by their join key
  * with the SAME bucket count makes every future equi-join on that key
  * co-located — Spark matches the two `HashPartitioning(key, n)`
  * layouts and plans a SortMergeJoin with NO Exchange on either side.
  * At 100 TB this is the difference between re-shuffling both tables
  * on every join and shuffling each exactly once, at write time.
  *
  * Layout details:
  *   - `repartition(n, key)` before the write uses the same murmur3
  *     hash-mod-n placement `bucketBy` itself uses, so each task holds
  *     exactly one bucket and writes exactly ONE file per bucket;
  *     combined with `sortBy(key)` the reader then knows each bucket is
  *     globally sorted and can skip the per-partition Sort too.
  *   - Tables are registered per source dir (the sf fixture path is
  *     part of the table name), data under /tmp — an external-path
  *     `saveAsTable`, the in-memory-catalog equivalent of a production
  *     warehouse's bucketed tables.
  *
  * BucketedJoinSpec asserts the no-Exchange / no-Sort plan shape;
  * `q36_bucketed_join` gates the values against the plain-parquet
  * oracle (bucketing must never change results, only the plan).
  */
object BucketedTables {

  /** Buckets are a FIXED property of the written layout (both sides
    * must agree forever); 8 keeps the sf fixtures honest, a 100 TB
    * deployment picks a count sized to executors × cores. */
  val BucketCount = 8

  private def tag(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9]", "_")

  def ordersTable(dir: String): String = s"orders_bkt_${tag(dir)}"
  def lineitemTable(dir: String): String = s"lineitem_bkt_${tag(dir)}"

  /** One-time fixture setup per (session, dir) — the analogue of the
    * warehouse's nightly bucketed write, NOT part of query execution
    * (Bench calls this beside RemoteQueries.ensure, outside the timed
    * window). */
  def ensure(spark: SparkSession, dir: String): Unit = synchronized {
    write(spark, dir, "orders", ordersTable(dir), "o_orderkey")
    write(spark, dir, "lineitem", lineitemTable(dir), "l_orderkey")
  }

  private def write(spark: SparkSession, dir: String, src: String,
      table: String, key: String): Unit = {
    if (!spark.catalog.tableExists(table)) {
      Tables.table(spark, dir, src)
        .repartition(BucketCount, col(key))
        .write.format("parquet")
        .bucketBy(BucketCount, key).sortBy(key)
        .option("path", s"/tmp/graft_bucketed/$table")
        .mode("overwrite")
        .saveAsTable(table)
    }
  }
}
