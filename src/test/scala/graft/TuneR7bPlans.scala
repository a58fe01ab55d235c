package graft

/** One-off plan audit for the round-7b operators (run manually:
  * `sbt "Test/runMain graft.TuneR7bPlans"`). */
object TuneR7bPlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val dir = "/root/testdata/sf0.001"
    for (q <- Seq("p49_domain_block", "p50_url_dedup", "p51_bm25_topk",
        "p52_rank_fusion", "p53_unicode_dedup", "q47_listagg",
        "q48_grouping_sets")) {
      println(s"==== $q")
      val plan = SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      println(plan.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Join") ||
          l.contains("Cartesian") || l.contains("Window") ||
          l.contains("TopK")).mkString("\n"))
    }
    spark.stop()
  }
}
