package graft

import org.apache.spark.sql.functions._

/** Round-14 probe: p28's LSH edge generation (tau=0.4, 4 planes, 24
  * tables — the recall-1.0 fixture config) with dedupeEarly on/off,
  * and the full p28 composition both ways. Identical outputs by
  * construction (cosine is deterministic per pair; the dedup side
  * only moves). Run: sbt "Test/runMain graft.TuneP28" */
object TuneP28 {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val vecs = Tables.table(spark, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec")).cache()
    vecs.count()
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    def time[A](label: String)(f: => A): A = {
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val r = f
      println(f"TUNEP28 $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs " +
        f"jobs=${jobs.get() - j0}")
      r
    }
    for (rep <- 1 to 3) {
      for (early <- Seq(true, false)) {
        SparkEntry.resetSessionConfs(spark)
        vecs.cache().count()
        val pairs = graft.operators.VectorOps.lshNearDupPairs(
          vecs, tau = 0.4, nPlanes = 4, nTables = 24, dedupeEarly = early)
        val n = time(s"rep$rep edges dedupeEarly=$early") {
          pairs.queryExecution.toRdd.count()
        }
        println(s"TUNEP28 rep$rep edges=$n early=$early")
      }
      // full p28 both ways (the CC loop runs EAGERLY inside
      // dedupClusters — time the build too, like the bench does)
      for (early <- Seq(true, false)) {
        SparkEntry.resetSessionConfs(spark)
        vecs.cache().count()
        val all = vecs
        time(s"rep$rep full p28 early=$early") {
          val pairs = graft.operators.VectorOps.lshNearDupPairs(
            all, tau = 0.4, nPlanes = 4, nTables = 24, dedupeEarly = early)
          val cc = time(s"rep$rep   cc-build early=$early") {
            graft.operators.ClusterOps
              .dedupClusters(all, "id", pairs, "id_a", "id_b")
          }
          val out = cc
            .select(col("doc_id").as("vec_id"), col("comp"),
              col("cluster_size"), col("keep"))
            .orderBy(col("vec_id"))
          out.queryExecution.toRdd.count()
        }
      }
    }
    spark.stop()
  }
}
