package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.Bridge

/** Manual repro harness for the round-5 p27 finding: monotone rep
  * growth on the driver bench (2.88/5.58/6.04 s vs 1.89 s idle).
  * Mimics Bench's protocol (warmup at sf0.001, timed reps at sf0.1,
  * resetSessionConfs between reps) and prints broadcast/shuffle
  * residue per rep. `GRAFT_SWEEP_GC=0` disables the deterministic
  * broadcast/shuffle sweep to reproduce the round-5 behavior.
  * Run: `sbt "Test/runMain graft.TuneP27"`. */
object TuneP27 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sweep = sys.env.getOrElse("GRAFT_SWEEP_GC", "1") != "0"
    val names = sys.env.getOrElse("GRAFT_QUERIES", "p27_ivf_pq")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val reps = sys.env.getOrElse("GRAFT_REPS", "6").toInt
    val sc = spark.sparkContext
    def residue(): String = {
      val bc = Bridge.liveBroadcastIds(sc)
      val sh = Bridge.liveShuffleIds(sc)
      val infos = sc.getRDDStorageInfo
      val used = Bridge.storageMemoryUsed(sc) / (1024.0 * 1024.0)
      f"bc=${bc.size} shuffles=${sh.size} rdds=${infos.length} storageMB=$used%.0f"
    }
    // warmup, Bench-style
    names.foreach { n =>
      SparkEntry.resetSessionConfs(spark)
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
    }
    println(s"[p27] after warmup: ${residue()}  sweep=$sweep")
    for (n <- names; r <- 1 to reps) {
      SparkEntry.resetSessionConfs(spark)
      if (sweep) {
        Bridge.destroyBroadcasts(sc, Bridge.liveBroadcastIds(sc))
        Bridge.cleanShuffles(sc, Bridge.liveShuffleIds(sc))
      }
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.1").count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[p27] $n rep$r: $sec%.2fs  ${residue()}")
    }
    spark.stop()
  }
}
