package graft

import org.apache.spark.sql.functions._

object TuneP10Plan {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize",
      sys.env.getOrElse("MINPART", "1m"))
    val df = SparkEntry.queries("p10_embed_lsh")(spark, "/root/testdata/sf0.1")
    df.queryExecution.toRdd.count()
    println("=== FINAL PLAN ===")
    println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
