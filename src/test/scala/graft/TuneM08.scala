package graft

import org.apache.spark.sql.functions._

/** Round-11 probe: m08 phase costs + dhash-bucket saturation at a
  * given SF. Run: sbt "Test/runMain graft.TuneM08 /root/repo/sf10" */
object TuneM08 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkTestSession.spark
    import graft.multimodal.MultimodalOps
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val fh = MultimodalOps.videoFrameHashes(
      MultimodalOps.videoAssetsUniform(spark, dir, nFrames = 8, w = 16, h = 8),
      w = 16, h = 8).toDF()
      .select(col("asset_id").as("id"), col("dhash")).distinct()
      .persist()
    time("decode+hash+distinct")(println(s"  rows: ${fh.count()}"))
    val sized = fh.groupBy(col("dhash")).agg(count(lit(1)).as("n"))
    val stats = sized.agg(count(lit(1)).as("buckets"),
      max(col("n")).as("max_bucket"),
      sum(col("n") * (col("n") - 1) / 2).as("pair_occurrences"),
      sum(when(col("n") >= 2, 1L).otherwise(0L)).as("colliding_buckets"))
      .collect().head
    println(s"  buckets=${stats.get(0)} max=${stats.get(1)} " +
      s"pairs=${stats.get(2)} colliding=${stats.get(3)}")
    time("pairs")(println(s"  out: ${MultimodalOps.videoNearDupPairs(
      fh, minShared = 1).count()}"))
    spark.stop()
  }
}
