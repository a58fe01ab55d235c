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
  *
  * BYTES mode (round 13, VERDICT r12 item 2):
  * `sbt "Test/runMain graft.TuneScreen bytes [sfDir]"` measures the
  * probe⋈index exchange under a FORCED shuffle join (broadcast off —
  * the at-scale shape where the probe side no longer fits in a
  * broadcast), spelled both ways: raw shingle STRINGS as the join key
  * (round 12) vs the 62-bit dual-poly key (round 13). Reports shuffle
  * records/bytes for each — the evidence behind the hash-key diet.
  */
object TuneScreen {
  def main(args: Array[String]): Unit = {
    val bytesMode = args.headOption.contains("bytes")
    val capOnly = args.contains("caponly") // hot fixtures: uncapped is
    // quadratic in the boiler df and infeasible at sf10h — measure the
    // capped run against PLANTED ground truth instead
    val rest = (if (bytesMode) args.drop(1) else args)
      .filterNot(_ == "caponly")
    val dir = if (rest.length > 0) rest(0) else "/root/repo/sf10"
    val cap = if (rest.length > 1) rest(1).toLong else 1000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      // match graft.Bench (round 13): cached-plan AQE coalescing
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
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

    if (bytesMode) {
      import java.util.concurrent.atomic.AtomicLong
      val sets = base.select(col("doc_id").as("id"),
          graft.functions.native.shingle_set(toks, 3).as("sh"))
        .filter(size(col("sh")) >= 5)
        .persist()
      sets.count()
      def key(s: org.apache.spark.sql.Column) =
        graft.functions.native.poly_fingerprint(s, 31L, 2147483647L) *
          2147483648L +
          graft.functions.native.poly_fingerprint(s, 37L, 2147483629L)
      def measure(tag: String, keyed: Boolean): Unit = {
        val recs = new AtomicLong; val bts = new AtomicLong
        val l = new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            val m = t.taskMetrics
            if (m != null) {
              recs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
              bts.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            }
          }
        }
        val probe0 = sets.select(col("id").as("ida"),
          explode(graft.functions.native.containment_minhash(col("sh"), 16))
            .as("s"))
        val index0 = sets.select(col("id").as("idb"),
          explode(col("sh")).as("s"))
        val probe = if (keyed)
          probe0.select(col("ida"), key(col("s")).as("t"))
          else probe0.withColumnRenamed("s", "t")
        val index = if (keyed)
          index0.select(col("idb"), key(col("s")).as("t"))
          else index0.withColumnRenamed("s", "t")
        val joined = probe.join(index, "t")
          .filter(col("ida") =!= col("idb"))
          .groupBy(col("ida"), col("idb")).agg(count(lit(1)).as("m"))
        spark.sparkContext.addSparkListener(l)
        val t0 = System.nanoTime()
        try {
          joined.queryExecution.toRdd.count()
          var last = -1L; var same = 0
          while (same < 3) {
            Thread.sleep(100)
            val cur = recs.get + bts.get
            if (cur == last) same += 1 else { same = 0; last = cur }
          }
        } finally spark.sparkContext.removeSparkListener(l)
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"TUNESCREEN bytes[$tag]: ${recs.get}%,d shuffle records, " +
          f"${bts.get}%,d shuffle bytes, $secs%6.2fs wall")
      }
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      measure("string-key (round 12)", keyed = false)
      measure("62-bit-key (round 13)", keyed = true)
      spark.stop()
      return
    }

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
      // planted ground truth: excerpt 2000000+i ⊂ source i for the
      // first 40 docs (minus any that fall below the shingle floor)
      val planted = out.count { case (a, b) => a == b + 2000000L }
      println(f"TUNESCREEN $tag: $secs%6.2fs, ${out.size} pairs " +
        f"($planted planted-excerpt hits), obs=" +
        m.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(", "))
      out
    }
    if (capOnly) {
      run(s"cap=$cap", cap)
    } else {
      val full = run("uncapped", Long.MaxValue)
      val capped = run(s"cap=$cap", cap)
      val lost = full -- capped
      println(f"TUNESCREEN recall: ${capped.size}/${full.size} " +
        f"(${if (full.isEmpty) 1.0 else capped.size.toDouble / full.size}%.4f); " +
        s"lost=${lost.size}" +
        (if (lost.nonEmpty && lost.size <= 10) s" $lost" else ""))
    }
    spark.stop()
  }
}
