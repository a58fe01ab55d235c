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
    "q28_rangejoin_auto", "q29_streamjoin", "q30_topk_per_key",
    "q33_pivot", "q36_bucketed_join", "q38_json", "q40_window_funcs",
    "r01_remote_filter", "r04_remote_partitioned_agg",
    "r06_remote_join_pushdown", "r09_remote_groupby",
    "p01_text_stats", "p02_exact_dedup", "p05_minhash_lsh",
    "p07_simhash", "p08_knn", "p10_embed_lsh", "p24_embed_lsh_adaptive",
    "p11_ivf_knn",
    "p14_dedup_cluster", "p15_stratified_sample", "p16_quality_pipeline",
    "p17_fuzzy_pairs", "p18_repetition", "p19_pii", "p20_decontam",
    "p21_packing", "p22_unigram_lm", "p23_quantize", "p25_chunking",
    "p26_tfidf",
    "m01_multimodal", "m02_frame_sample", "m03_resize")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_EXCLUDE: comma-separated query names to skip — used
    // by stress runs above fixture scale, where the oracle-strength
    // configurations (sized for exact-recall on the fixtures, e.g.
    // p10's 4x24 LSH) are quadratic BY DESIGN like p06/p09
    val exclude = sys.env.getOrElse("SPARK_GRAFT_EXCLUDE", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    val active = headline.filterNot(exclude)
    if (exclude.nonEmpty)
      System.err.println(s"[bench] excluded: ${exclude.mkString(", ")}")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up protocol: run the FULL headline set once against the tiny
    // sf0.001 fixture so JIT, classloading, codegen compilation and the
    // first-touch of every operator's machinery land outside the timed
    // window — "warm code, cold data". BASELINE.md records numbers under
    // this same protocol, so driver runs and the baseline are comparable.
    val warmDir = "/root/testdata/sf0.001"
    active.foreach { name =>
      // reset leaked confs here too (q28/r06 set theirs during execution):
      // warmup must compile the SAME plans the timed loop compiles
      SparkEntry.resetSessionConfs(spark)
      try SparkEntry.queries(name)(spark, warmDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $name failed: $e") }
    }
    // the Derby "remote DB" fixture is one-time setup (the analogue of
    // standing up the remote database), not query execution — build it
    // outside the timed window; ConnectorBench times the insert path.
    try RemoteQueries.ensure(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[bench] remote fixture setup failed: $e") }
    // bucketed-layout fixture: the "nightly bucketed write" happens
    // once, outside the timed window — q36 times the co-located join
    try BucketedTables.ensure(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[bench] bucketed fixture setup failed: $e") }
    // Noise immunity: time each query REPS times in-process and report
    // the per-query MEDIAN. A single-shot timing conflates the query
    // with whatever the machine was doing that second (observed: 1.8×
    // total swings under background load); the median of 3+ strips the
    // outlier without hiding a real regression.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    var errors = List.empty[String]
    val results = active.map { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).flatMap { _ =>
        // q28/r06 legitimately set session confs their own execution
        // needs (optimizer rewrites fire at execution, not build);
        // reset them BEFORE each rep so no rep times under another's
        // leaked confs
        SparkEntry.resetSessionConfs(spark)
        val t0 = System.nanoTime()
        // a failed query must be VISIBLE, not a fast fake timing
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch {
          case e: Throwable =>
            errors ::= s"$name: ${e.getClass.getSimpleName}"
            System.err.println(s"[bench] $name FAILED: $e")
            None
        }
      }
      val median =
        if (times.isEmpty) 0.0
        else times.sorted.apply(times.size / 2)
      System.err.println(f"[bench] $name: $median%.2fs (${times.size}/$reps reps)")
      name -> median
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.reverse
      .map(e => "\"" + e.replace("\"", "'") + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}
