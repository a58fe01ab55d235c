package graft

/** Round-11 probe: PPJoin positional-filter refutation rate + p69 cost.
  * Run: sbt "Test/runMain graft.TunePos /root/testdata/sf0.1" */
object TunePos {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkTestSession.spark
    val d = Tables.table(spark, dir, "documents")
    val obs = org.apache.spark.sql.Observation("pos")
    val t0 = System.nanoTime()
    val n = graft.operators.DedupOps
      .setSimJoinExact(d, "doc_id", "text", tau = 0.65, candObs = Some(obs))
      .count()
    println(f"full p69: ${(System.nanoTime() - t0) / 1e9}%.2f s, pairs=$n")
    println(s"pairs_after_length=${obs.get("pairs_after_length")} " +
      s"pairs_after_positional=${obs.get("pairs_after_positional")}")
    spark.stop()
  }
}
