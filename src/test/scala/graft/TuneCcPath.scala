package graft

import org.apache.spark.sql.functions._

object TuneCcPath {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val path = (0 until 63).map(i => (i.toLong, i + 1L)).toDF("a", "b")
    val t0 = System.nanoTime()
    val cc = graft.operators.ClusterOps.connectedComponents(path, "a", "b", maxIter = 80)
    val bad = cc.filter(col("comp") =!= 0L).count()
    println(f"TUNECC path64: wrong=${bad} time=${(System.nanoTime()-t0)/1e9}%.2fs")
    spark.stop()
  }
}
