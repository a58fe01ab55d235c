package graft

import org.apache.spark.sql.SparkSession

/** Round-12 scheduling-floor measurement for BPE training (VERDICT r11
  * item 5): times sequential [[graft.operators.LmOps.bpeTrain]] vs
  * [[graft.operators.LmOps.bpeTrainBatched]] at a production-shaped
  * merge count and reports rounds/sec and merges/sec — the evidence
  * behind SCALE.md's batching note. Also asserts the two merge tables
  * are IDENTICAL at this count on the fixture corpus.
  *
  * Run: `sbt "Test/runMain graft.TuneBpe [nMerges] [batch] [sfDir]"`.
  */
object TuneBpe {
  def main(args: Array[String]): Unit = {
    val nMerges = if (args.length > 0) args(0).toInt else 64
    val batch = if (args.length > 1) args(1).toInt else 16
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      // match graft.Bench (round 13): cached-plan AQE coalescing
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.table(spark, dir, "documents")
    docs.count() // warm the scan

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    import spark.implicits._
    val (seqT, tSeq) = time(
      operators.LmOps.bpeTrain(docs, "text", nMerges)
        .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1))
    val (batT, tBat) = time(
      operators.LmOps.bpeTrainBatched(docs, "text", nMerges, batch)
        .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1))
    val (rawT, tRaw) = time(
      operators.LmOps.bpeTrainBatched(docs, "text", nMerges, batch,
          exact = false)
        .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1))
    println(f"TUNEBPE sequential: $tSeq%7.2fs for ${seqT.size} merges " +
      f"(${seqT.size / tSeq}%5.2f merges/s, 1 job/round)")
    // batched rounds ≈ ceil-walk of admitted prefixes; report merges/s
    println(f"TUNEBPE batched($batch) exact: $tBat%7.2fs for " +
      f"${batT.size} merges (${batT.size / tBat}%5.2f merges/s, " +
      f"speedup ${tSeq / tBat}%4.2fx)")
    println(f"TUNEBPE batched($batch) unguarded: $tRaw%7.2fs for " +
      f"${rawT.size} merges (${rawT.size / tRaw}%5.2f merges/s, " +
      f"speedup ${tSeq / tRaw}%4.2fx)")
    val same = seqT == batT
    println(s"TUNEBPE equality (exact mode): $same")
    if (!same) {
      val i = seqT.zip(batT).indexWhere { case (a, b) => a != b }
      println(s"TUNEBPE EXACT-MODE DIVERGENCE (a bug) at merge ${i + 1}" +
        s":\n  seq=${seqT.lift(i)}\n  bat=${batT.lift(i)}")
    }
    val sameRaw = seqT == rawT
    println(s"TUNEBPE equality (unguarded): $sameRaw")
    if (!sameRaw) {
      // expected for unguarded mode: a merge-created pair can overtake
      // a stale-ranked admission mid-batch (see bpeTrainBatched
      // scaladoc) — report the fidelity horizon
      val i = seqT.zip(rawT).indexWhere { case (a, b) => a != b }
      println(s"TUNEBPE unguarded first divergence at merge ${i + 1} " +
        s"(exact prefix: $i merges):\n  seq=${seqT.lift(i)}" +
        s"\n  raw=${rawT.lift(i)}")
    }
    spark.stop()
  }
}
