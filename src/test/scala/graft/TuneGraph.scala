package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Production-config graph timing (round-9, VERDICT r8 item 8): the
  * p65/p67 gates run 3 iterations for oracle tractability; the GraphOps
  * scaladoc promises the host-rank production config (10–20 iterations,
  * periodic lineage cuts). This measures pageRank at iters=15,
  * checkpointEvery=5 over the p65 synthetic graph (3 edges/node) at
  * sf0.1 and sf1 — run manually, results recorded in SCALE.md. */
object TuneGraph {
  def main(args: Array[String]): Unit = {
    val iters = if (args.nonEmpty) args(0).toInt else 15
    val ckpt = if (args.length > 1) args(1).toInt else 5
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val dirs = Seq(
      "/root/testdata/sf0.1" -> "sf0.1",
      "/root/repo/sf1" -> "sf1").filter(d => new java.io.File(d._1).isDirectory)
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      // match graft.Bench (round 13): cached-plan AQE coalescing
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def edges(dir: String) = {
      val d = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"))
      d.crossJoin(broadcast(d.agg((max(col("doc_id")) + 1).as("nn"))))
        .select(col("doc_id").as("src"), explode(array(
          (col("doc_id") * 7 + 1) % col("nn"),
          (col("doc_id") * 13 + 5) % col("nn"),
          col("doc_id") % 97)).as("dst"))
    }
    // warmup
    graft.operators.GraphOps.pageRank(
      edges("/root/testdata/sf0.001"), "src", "dst", iters = 2).count()
    for ((dir, tag) <- dirs) {
      val ts = (1 to reps).map { _ =>
        SparkEntry.resetSessionConfs(spark)
        System.gc()
        val t0 = System.nanoTime()
        graft.operators.GraphOps.pageRank(edges(dir), "src", "dst",
          iters = iters, checkpointEvery = ckpt).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"GRAPH $tag pageRank iters=$iters ckpt=$ckpt " +
        f"median=${ts.sorted.apply(ts.size / 2)}%.2fs " +
        s"reps=[${ts.map(t => f"$t%.2f").mkString(", ")}]")
    }
    spark.stop()
  }
}
