package graft

import org.apache.spark.sql.functions._

/** Manual tuning harness: LSH pair recall vs brute force per
  * (nPlanes, nTables), at each fixture SF. Run:
  * `sbt "Test/runMain graft.TuneLsh"`. */
object TuneLsh {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    for (sf <- Seq("0.01", "0.1")) {
      val dir = s"/root/testdata/sf$sf"
      val vecs = Tables.table(spark, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec")).cache()
      val exact = graft.operators.VectorOps.bruteForcePairs(vecs, tau = 0.4)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"sf$sf exact pairs: ${exact.size}")
      for (planes <- Seq(4, 5); tables <- Seq(8, 12, 16, 24)) {
        val t0 = System.nanoTime()
        val got = graft.operators.VectorOps.lshNearDupPairs(
            vecs, tau = 0.4, nPlanes = planes, nTables = tables)
          .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val sec = (System.nanoTime() - t0) / 1e9
        val recall = if (exact.isEmpty) 1.0 else
          got.count(exact.contains).toDouble / exact.size
        println(f"sf$sf planes=$planes tables=$tables pairs=${got.size} recall=$recall%.4f time=$sec%.2fs")
      }
      vecs.unpersist()
    }
    spark.stop()
  }
}
