package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join: both sides pre-bucketed on the join key
  * must plan a SortMergeJoin with no Exchange and no Sort below it —
  * the storage layout replaces the runtime shuffle. Values must be
  * identical to the plain-parquet join (layout never changes results).
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def bucketedJoin() = {
    BucketedTables.ensure(spark, dir)
    spark.table(BucketedTables.ordersTable(dir))
      .join(spark.table(BucketedTables.lineitemTable(dir)).hint("merge"),
        col("o_orderkey") === col("l_orderkey"))
  }

  test("bucketed join plans with no Exchange") {
    val df = bucketedJoin().select(col("o_orderkey"), col("l_quantity"))
    df.collect() // finalize the adaptive plan before inspecting it
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle:\n$plan")
  }

  test("bucketed join values match the plain parquet join") {
    val bucketed = bucketedJoin()
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority")).collect()
    val plain = Tables.table(spark, dir, "orders")
      .join(Tables.table(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority")).collect()
    assert(bucketed.toSeq == plain.toSeq)
  }

  test("re-ensure is idempotent (no rewrite when the table exists)") {
    BucketedTables.ensure(spark, dir)
    val n1 = spark.table(BucketedTables.ordersTable(dir)).count()
    BucketedTables.ensure(spark, dir)
    assert(spark.table(BucketedTables.ordersTable(dir)).count() == n1)
  }
}
