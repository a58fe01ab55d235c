package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Round-13 optimization probe: per-gate timing under the EXACT Bench
  * protocol (local[32], shuffle.partitions=32, AQE on, sf0.001 warmup,
  * resetSessionConfs + System.gc between reps, `toRdd.count` action +
  * fireObservations) PLUS the evidence the optimization round needs:
  *
  *   - per-rep seconds and the median (Bench-comparable numbers)
  *   - job count / task count / shuffle read+write bytes per rep via a
  *     SparkListener — iterative gates' cost is jobs × scheduling
  *     floor, so "how many jobs, how many tasks each" is the number
  *     the guide's §1 measurement step needs for them
  *   - `explain("formatted")` written to plans/r13/<gate>_<SUFFIX>.txt
  *     when SPARK_GRAFT_PLANS=<SUFFIX> is set (the judge-checkable
  *     before/after plan artifacts)
  *
  * Run: sbt "Test/runMain graft.TuneR13 p88_bpe_deep m13_image_dedup_cluster"
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_REPS (default 3), SPARK_GRAFT_PLANS (plan suffix).
  */
object TuneR13 {
  private final class Probe extends SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val shufRead = new java.util.concurrent.atomic.AtomicLong
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    override def onJobStart(j: SparkListenerJobStart): Unit =
      jobs.incrementAndGet()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      val m = t.taskMetrics
      if (m != null) {
        shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    def reset(): Unit = { jobs.set(0); tasks.set(0)
      shufRead.set(0); shufWrite.set(0) }
    def line: String =
      f"jobs=${jobs.get} tasks=${tasks.get} " +
        f"shufR=${shufRead.get / 1024.0}%.0fKB shufW=${shufWrite.get / 1024.0}%.0fKB"
  }

  def main(args: Array[String]): Unit = {
    val names = args.toSeq
    require(names.nonEmpty, "pass gate names")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val planSuffix = sys.env.get("SPARK_GRAFT_PLANS")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "1") == "1")
      // A/B toggle for the round-13 experiment: let AQE re-coalesce
      // CACHED plan output (default false in Spark — cached builds keep
      // the raw shuffle partition count, which is where the iterative
      // loops' 32-tiny-tasks-per-round floor comes from)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_AQE", "1") == "1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val probe = new Probe
    spark.sparkContext.addSparkListener(probe)

    def execFull(df: org.apache.spark.sql.DataFrame): Long = {
      val t0 = System.nanoTime()
      val n = df.queryExecution.toRdd.count()
      org.apache.spark.sql.graftbridge.Bridge.fireObservations(
        df, "tuneCount", System.nanoTime() - t0)
      n
    }

    // Bench warmup protocol: full pass on the tiny fixture first
    names.foreach { n =>
      SparkEntry.resetSessionConfs(spark)
      try execFull(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001"))
      catch { case e: Throwable => System.err.println(s"[warmup $n] $e") }
    }
    ObsRegistry.drain()
    try RemoteQueries.ensure(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[remote] $e") }
    try BucketedTables.ensure(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[bucketed] $e") }
    try { IvfIndex.ensureFull(spark, sfDir); IvfIndex.ensureHist(spark, sfDir) }
    catch { case e: Throwable => System.err.println(s"[ivf] $e") }

    for (n <- names) {
      planSuffix.foreach { suf =>
        SparkEntry.resetSessionConfs(spark)
        val df = SparkEntry.queries(n)(spark, sfDir)
        val dir = new java.io.File("/root/repo/plans/r13")
        dir.mkdirs()
        val p = new java.io.File(dir, s"${n}_$suf.txt").toPath
        java.nio.file.Files.write(p,
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"TUNE13 $n plan -> $p")
      }
      val stats = (1 to reps).map { _ =>
        SparkEntry.resetSessionConfs(spark)
        System.gc()
        probe.reset()
        val t0 = System.nanoTime()
        execFull(SparkEntry.queries(n)(spark, sfDir))
        val sec = (System.nanoTime() - t0) / 1e9
        // listener-bus settle so the probe's counters are complete
        // (listenerBus.waitUntilEmpty is private[spark])
        Thread.sleep(400)
        (sec, probe.line)
      }
      if (stats.isEmpty) { // SPARK_GRAFT_REPS=0: plans-only mode
        println(s"TUNE13 $n plans-only")
      } else {
      val med = stats.map(_._1).sorted.apply(stats.size / 2)
      println(f"TUNE13 $n%-28s median=$med%7.3fs reps=[${
        stats.map(s => f"${s._1}%.3f").mkString(", ")}]")
      stats.zipWithIndex.foreach { case ((_, l), i) =>
        println(s"TUNE13 $n rep${i + 1}: $l") }
      ObsRegistry.drain().foreach { case (on, m) =>
        val kv = m.toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k=$v" }.mkString(", ")
        println(s"TUNE13 $n obs($on): $kv")
      }
      }
    }
    spark.stop()
  }
}
