package graft

/** One-off plan audit for the round-7 operators (run manually:
  * `sbt "Test/runMain graft.TuneR7Plans"`). */
object TuneR7Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val dir = "/root/testdata/sf0.001"
    for (q <- Seq("p42_span_removal", "m08_video_neardup", "p44_corpus_card",
        "p43_mixture_epochs")) {
      println(s"==== $q")
      val plan = SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      println(plan.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Join") ||
          l.contains("Cartesian") || l.contains("Window")).mkString("\n"))
    }
    spark.stop()
  }
}
