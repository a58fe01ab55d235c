package graft
object DebugPlans {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false")
      .config("spark.sql.adaptive.enabled","true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q01_agg","q03_join_topk","q17_join6","q02_filter_agg")) {
      println(s"==== $q")
      val df = SparkEntry.queries(q)(spark, dir)
      println(df.queryExecution.executedPlan.treeString.linesIterator
        .filter(l => l.contains("Scan") || l.contains("Join") || l.contains("Exchange")
          || l.contains("WholeStageCodegen") || l.contains("PushedFilters")
          || l.contains("HashAggregate") || l.contains("TakeOrdered"))
        .map(_.take(220)).mkString("\n"))
    }
    spark.stop()
  }
}
