package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 scale probe for the threshold-gated INCREMENTAL BPE
  * pair-count table (VERDICT r13 item 5): the repo fixtures' documents
  * are word-soup over a 31-word vocabulary (recount = 107 exploded
  * rows at ANY sf — pure scheduler floor), so the data-proportional
  * recount cost the incremental table removes needs a synthetic
  * vocabulary-rich corpus to exist at all. This probe builds one
  * (n distinct 8-hex-char words via md5, one word per row — pair
  * structure comes from the shared hex alphabet), then times
  * bpeTrain / bpeTrainBatched in BOTH modes on the SAME tree by
  * flipping spark.graft.bpe.incremental.minRecountRows, asserting
  * merge-table equality between the modes.
  *
  * Run: sbt "Test/runMain graft.TuneBpeScale [nWords] [nMerges] [batch]"
  */
object TuneBpeScale {
  def main(args: Array[String]): Unit = {
    val nWords = if (args.length > 0) args(0).toLong else 2000000L
    val nMerges = if (args.length > 1) args(1).toInt else 24
    val batch = if (args.length > 2) args(2).toInt else 8
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // n distinct 8-char hex words (md5 prefix), one per row: the word
    // table is n rows / n·7 recount rows, and the 16-char alphabet
    // gives every merge round real cross-word pair mass
    val docs = spark.range(nWords)
      .select(substring(md5(col("id").cast("string")), 1, 8).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()
    println(s"TUNEBPESCALE corpus: $nWords rows, recount ~ ${nWords * 7}")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    import spark.implicits._
    def run(mode: String, threshold: String)
        : (Seq[(Int, String, String, Long)], Double, Double) = {
      spark.conf.set(operators.LmOps.IncrementalRecountRowsConf, threshold)
      val (seqT, tSeq) = time(
        operators.LmOps.bpeTrain(docs, "text", nMerges)
          .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1))
      val (batT, tBat) = time(
        operators.LmOps.bpeTrainBatched(docs, "text", nMerges, batch)
          .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1))
      require(seqT == batT, s"seq != batched in $mode mode")
      println(f"TUNEBPESCALE $mode%-12s sequential: $tSeq%7.2fs " +
        f"(${seqT.size / tSeq}%5.2f merges/s)   batched($batch): " +
        f"$tBat%7.2fs (${batT.size / tBat}%5.2f merges/s)")
      (seqT, tSeq, tBat)
    }

    // alternate modes to cancel warmup drift; recount first
    val (m1, _, _) = run("recount", Long.MaxValue.toString)
    val (m2, _, _) = run("incremental", "1")
    val (m3, _, _) = run("recount", Long.MaxValue.toString)
    val (m4, _, _) = run("incremental", "1")
    println(s"TUNEBPESCALE merge-table equality across modes: " +
      s"${m1 == m2 && m2 == m3 && m3 == m4}")
    spark.stop()
  }
}
