package graft

import org.apache.spark.sql.functions._

/** Round-10 probe: which gates' `df.count()` (the Bench action) lets
  * Catalyst ELIMINATE the operator pipeline (left joins on unique
  * aggregate keys preserve cardinality, so count prunes them) — those
  * bench numbers measure a corpus count, not the operator.
  * Run: sbt "Test/runMain graft.TuneP79 /root/testdata/sf0.001" */
object TuneP79 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkTestSession.spark
    val suspects = Seq("p36_repeated_spans", "p42_span_removal",
      "p66_incremental_components", "q14_outerjoin", "p79_threshold_sweep",
      "p76_winnowing", "p55_incremental_reingest", "p16_quality_pipeline")
    suspects.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val cnt = df.groupBy().count()
      val opt = cnt.queryExecution.optimizedPlan.toString
      val hasJoin = opt.contains("Join")
      val hasGen = opt.contains("Generate") || opt.contains("Expand")
      val nLines = opt.linesIterator.size
      println(s"$name: count-plan lines=$nLines join=$hasJoin " +
        s"generate=$hasGen")
      SparkEntry.resetSessionConfs(spark)
    }
    spark.stop()
  }
}
