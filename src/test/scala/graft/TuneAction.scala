package graft

/** Round-10 probe: df.count() vs df.queryExecution.toRdd.count() cost
  * for representative gates — isolates what the bench-action protocol
  * change adds for UNAFFECTED (non-count-eliminated) queries.
  * Run: sbt "Test/runMain graft.TuneAction /root/testdata/sf0.1" */
object TuneAction {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkTestSession.spark
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
    }
    Seq("q01_agg", "q05_topk", "p02_exact_dedup").foreach { name =>
      (1 to 2).foreach { rep =>
        SparkEntry.resetSessionConfs(spark)
        time(s"$name rep$rep count()")(
          SparkEntry.queries(name)(spark, dir).count())
        SparkEntry.resetSessionConfs(spark)
        time(s"$name rep$rep toRdd.count()")(
          SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count())
      }
    }
    spark.stop()
  }
}
