package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Round-14 optimization probe — TuneR13 (the round-13 evidence
  * harness) plus a PER-STAGE breakdown: gate timing under the EXACT
  * Bench protocol (local[32], shuffle.partitions=32, AQE on, cached-
  * plan AQE coalescing on, sf0.001 warmup, resetSessionConfs +
  * System.gc between reps, `toRdd.count` + fireObservations), a
  * SparkListener recording per-rep jobs / tasks / shuffle bytes, and —
  * new this round — each rep's heaviest stages (task count, summed
  * task time, max task time), which is the §1 evidence for "this
  * operator's verify stage coalesced to too few tasks" class claims.
  *
  * Run: sbt "Test/runMain graft.TuneR14 p83_containment_join"
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_REPS (default 3), SPARK_GRAFT_PLANS (plan suffix,
  *      written to plans/r14/<gate>_<SUFFIX>.txt),
  *      SPARK_GRAFT_STAGES=1 (print per-stage lines).
  */
object TuneR14 {
  private final case class StageRec(
    id: Int, tasks: Int, sumMs: Long, maxMs: Long, name: String)

  private final class Probe extends SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val shufRead = new java.util.concurrent.atomic.AtomicLong
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    val stages =
      new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long, Long)]()
    val stageNames =
      new java.util.concurrent.ConcurrentHashMap[Int, String]()
    override def onJobStart(j: SparkListenerJobStart): Unit =
      jobs.incrementAndGet()
    override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
      stageNames.put(s.stageInfo.stageId,
        s.stageInfo.name.takeWhile(_ != '(').trim)
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      val m = t.taskMetrics
      if (m != null) {
        shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        val run = m.executorRunTime
        stages.merge(t.stageId, (1, run, run),
          (a, b) => (a._1 + b._1, a._2 + b._2, math.max(a._3, b._3)))
      }
    }
    def reset(): Unit = { jobs.set(0); tasks.set(0)
      shufRead.set(0); shufWrite.set(0); stages.clear(); stageNames.clear() }
    def line: String =
      f"jobs=${jobs.get} tasks=${tasks.get} " +
        f"shufR=${shufRead.get / 1024.0}%.0fKB shufW=${shufWrite.get / 1024.0}%.0fKB"
    def topStages(n: Int): Seq[StageRec] = {
      import scala.jdk.CollectionConverters._
      stages.asScala.toSeq
        .map { case (id, (t, sum, mx)) =>
          StageRec(id, t, sum, mx, stageNames.getOrDefault(id, "?")) }
        .sortBy(-_.sumMs).take(n)
    }
  }

  def main(args: Array[String]): Unit = {
    val names = args.toSeq
    require(names.nonEmpty, "pass gate names")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val planSuffix = sys.env.get("SPARK_GRAFT_PLANS")
    val showStages = sys.env.getOrElse("SPARK_GRAFT_STAGES", "0") == "1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "1") == "1")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_AQE", "1") == "1")
      // A/B toggle for the round-14 experiment: AQE coalescing floor
      // for compute-dense small-byte exchanges (verdict r13 item 3)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PART", "1m"))
      // A/B toggle for the round-14 scan-parallelism experiment: the
      // 4 MB openCostInBytes default floors split sizes at 4 MB, so a
      // ~12 MB fixture file scans as 3 tasks even though
      // minPartitionNum targets defaultParallelism
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("SPARK_GRAFT_OPEN_COST", "4194304"))
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
        val dir = new java.io.File("/root/repo/plans/r14")
        dir.mkdirs()
        val p = new java.io.File(dir, s"${n}_$suf.txt").toPath
        java.nio.file.Files.write(p,
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"TUNE14 $n plan -> $p")
      }
      val stats = (1 to reps).map { _ =>
        SparkEntry.resetSessionConfs(spark)
        System.gc()
        probe.reset()
        val t0 = System.nanoTime()
        execFull(SparkEntry.queries(n)(spark, sfDir))
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(400)
        (sec, probe.line, probe.topStages(8))
      }
      if (stats.isEmpty) {
        println(s"TUNE14 $n plans-only")
      } else {
        val med = stats.map(_._1).sorted.apply(stats.size / 2)
        println(f"TUNE14 $n%-28s median=$med%7.3fs reps=[${
          stats.map(s => f"${s._1}%.3f").mkString(", ")}]")
        stats.zipWithIndex.foreach { case ((_, l, _), i) =>
          println(s"TUNE14 $n rep${i + 1}: $l") }
        if (showStages) stats.lastOption.foreach { case (_, _, tops) =>
          tops.foreach { s =>
            println(f"TUNE14 $n stage ${s.id}%4d tasks=${s.tasks}%4d " +
              f"sum=${s.sumMs}%6dms max=${s.maxMs}%5dms ${s.name}")
          }
        }
        ObsRegistry.drain().foreach { case (on, m) =>
          val kv = m.toSeq.sortBy(_._1)
            .map { case (k, v) => s"$k=$v" }.mkString(", ")
          println(s"TUNE14 $n obs($on): $kv")
        }
      }
    }
    spark.stop()
  }
}
