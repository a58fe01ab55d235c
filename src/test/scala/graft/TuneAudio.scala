package graft

/** Manual timing harness for m04: WAV decode throughput at sf1 (the
  * round-5 bench caught a 15× scale ratio caused by per-call
  * ServiceLoader lookups inside AudioSystem.getAudioInputStream).
  * Run: `sbt "Test/runMain graft.TuneAudio [sfDir]"`. */
object TuneAudio {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val dir = if (args.nonEmpty) args(0) else "/root/repo/sf1"
    val q = PipelineQueries.queries("m04_audio")
    q(spark, dir).count() // warm: plan + code paths
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      q(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"m04_audio @ $dir: median ${ts.sorted.apply(1)}%.2fs (reps ${ts.map(t => f"$t%.2f").mkString(",")})")
  }
}
