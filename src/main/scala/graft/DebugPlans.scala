package graft
object DebugPlans {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false")
      .config("spark.sql.adaptive.enabled","true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("q01_agg","q03_join_topk","q17_join6","q02_filter_agg",
        "q28_rangejoin_auto","q30_topk_per_key","q31_salted_join",
        "q32_asof_bucketed","r06_remote_join_pushdown","p11_ivf_knn",
        "r09_remote_groupby","p20_decontam","p21_packing","p22_unigram_lm")
    for (q <- qs) {
      println(s"==== $q")
      SparkEntry.resetSessionConfs(spark)
      val df = SparkEntry.queries(q)(spark, dir)
      println(df.queryExecution.executedPlan.treeString.linesIterator
        .filter(l => l.contains("Scan") || l.contains("Join") || l.contains("Exchange")
          || l.contains("WholeStageCodegen") || l.contains("PushedFilters")
          || l.contains("HashAggregate") || l.contains("TakeOrdered")
          || l.contains("TopKPerKey") || l.contains("Generate") || l.contains("Window"))
        .map(_.take(220)).mkString("\n"))
    }
    spark.stop()
  }
}
