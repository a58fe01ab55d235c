package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: headline queries on SPARK_GRAFT_SF_DIR at
  * local[32], one JSON line on stdout (driver contract).
  *
  * The headline set covers each operator family once — scan+agg,
  * filter, multi-join, window, top-k, connector round-trip, dedup LSH,
  * ANN top-k, multimodal — and excludes the deliberately-O(n²)
  * brute-force baselines (those exist for oracle verification, not
  * throughput; ngramJaccardPairs documents "never run this at scale").
  */
object Bench {
  val headline: Seq[String] = Seq(
    "q01_agg", "q02_filter_agg", "q03_join_topk", "q04_window",
    "q05_topk", "q11_rollup", "q15_events_day", "q17_join6",
    "r01_remote_filter", "r04_remote_partitioned_agg",
    "p01_text_stats", "p02_exact_dedup", "p05_minhash_lsh",
    "p07_simhash", "p08_knn", "p10_embed_lsh", "m01_multimodal")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one warm-up action so JIT/classloading doesn't land on the first query
    SparkEntry.queries("q02_filter_agg")(spark, sfDir).count()
    var errors = List.empty[String]
    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      // a failed query must be VISIBLE, not a fast fake timing
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          errors ::= s"$name: ${e.getClass.getSimpleName}"
          System.err.println(s"[bench] $name FAILED: $e")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.reverse
      .map(e => "\"" + e.replace("\"", "'") + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
