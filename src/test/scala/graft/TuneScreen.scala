package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-12 measurement of the containment screen's `maxBucket` skew
  * cap (the lever the exact join cannot use): runs
  * [[graft.operators.DedupOps.containmentScreen]] on the p85 planted-
  * excerpt construction uncapped vs capped, reporting wall time,
  * observed candidate volumes, output size, and RECALL of the capped
  * run vs the uncapped (which pairs the cap loses, if any).
  *
  * Run: `sbt "Test/runMain graft.TuneScreen [sfDir] [maxBucket]"`.
  */
object TuneScreen {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/repo/sf10"
    val cap = if (args.length > 1) args(1).toLong else 1000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = Tables.table(spark, dir, "documents")
    val toks = split(col("text"), " ")
    val base = d.select(col("doc_id"), col("text"))
      .unionAll(d.filter(col("doc_id") < 40)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          array_join(slice(toks, lit(1),
            greatest(ceil(size(toks).cast("double") / 2.0), lit(3))
              .cast("int")), " ").as("text")))
    base.count() // warm the scan

    def run(tag: String, maxBucket: Long): Set[(Long, Long)] = {
      operators.CacheRegistry.releaseAll()
      val obs = org.apache.spark.sql.Observation()
      val t0 = System.nanoTime()
      val out = operators.DedupOps.containmentScreen(base, "doc_id",
          "text", tau = 0.9, maxBucket = maxBucket, candObs = Some(obs))
        .select(col("contained"), col("container"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val secs = (System.nanoTime() - t0) / 1e9
      val m = org.apache.spark.sql.graftbridge.Bridge.observationMetrics(obs)
      println(f"TUNESCREEN $tag: $secs%6.2fs, ${out.size} pairs, obs=" +
        m.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(", "))
      out
    }
    val full = run("uncapped", Long.MaxValue)
    val capped = run(s"cap=$cap", cap)
    val lost = full -- capped
    println(f"TUNESCREEN recall: ${capped.size}/${full.size} " +
      f"(${if (full.isEmpty) 1.0 else capped.size.toDouble / full.size}%.4f); " +
      s"lost=${lost.size}" +
      (if (lost.nonEmpty && lost.size <= 10) s" $lost" else ""))
    spark.stop()
  }
}
