package graft

import org.apache.spark.sql.SparkSession

/** Focused idle-rep timing for the sf1 scale investigations (run
  * manually: `sbt "Test/runMain graft.TuneFocus p60_source_overlap ..."`).
  *
  * Mirrors Bench's protocol — warm-up on sf0.001, per-query reps with
  * resetSessionConfs between, fixture ensure() for remote/bucketed/ivf
  * paths — but runs ONLY the named queries so the timings are free of
  * suite-order residue (the p16/p27 lesson from rounds 6-7: broadcasts
  * and shuffle files accumulated by earlier queries inflate later
  * iterative queries' reps).
  */
object TuneFocus {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("p60_source_overlap", "p30_incremental_dedup",
        "p24_embed_lsh_adaptive")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val dirs = Seq(
      "/root/testdata/sf0.1" -> "sf0.1",
      "/root/repo/sf1" -> "sf1").filter(d => new java.io.File(d._1).isDirectory)
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      // match graft.Bench (round 13): cached-plan AQE coalescing
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      SparkEntry.resetSessionConfs(spark)
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case e: Throwable => System.err.println(s"[warmup $n] $e") }
    }
    for ((dir, tag) <- dirs) {
      try RemoteQueries.ensure(spark, dir)
      catch { case e: Throwable => System.err.println(s"[$tag remote] $e") }
      try BucketedTables.ensure(spark, dir)
      catch { case e: Throwable => System.err.println(s"[$tag bucketed] $e") }
      try { IvfIndex.ensureFull(spark, dir); IvfIndex.ensureHist(spark, dir) }
      catch { case e: Throwable => System.err.println(s"[$tag ivf] $e") }
      for (n <- names) {
        val ts = (1 to reps).map { _ =>
          SparkEntry.resetSessionConfs(spark)
          val t0 = System.nanoTime()
          SparkEntry.queries(n)(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }
        val med = ts.sorted.apply(ts.size / 2)
        println(f"FOCUS $tag $n%-26s median=$med%7.2fs reps=[${
          ts.map(t => f"$t%.2f").mkString(", ")}]")
        ObsRegistry.drain().foreach { case (on, m) =>
          val kv = m.toSeq.sortBy(_._1)
            .map { case (k, v) => s"$k=$v" }.mkString(", ")
          println(s"FOCUS $tag $n obs($on): $kv")
        }
      }
    }
    spark.stop()
  }
}
