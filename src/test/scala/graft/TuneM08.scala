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
      fh.toDF("asset_id", "dhash"), minShared = 1).count()}"))

    // WIDE-KEY probe: does a vertical-gradient companion hash (the
    // p07->p31 move) de-saturate the fixture's bucket space?
    import org.apache.spark.sql.Encoders
    val wide = MultimodalOps.videoAssetsUniform(spark, dir, 8, 16, 8)
      .mapPartitions { it =>
        it.flatMap { a =>
          val frameBytes = 54 + ((16 * 3 + 3) / 4) * 4 * 8
          Iterator.range(0, a.payload.length / frameBytes).map { f =>
            val one = java.util.Arrays.copyOfRange(
              a.payload, f * frameBytes, (f + 1) * frameBytes)
            val (w, h, rgb) = MultimodalOps.decodeRgb(one)
            def gs(gx: Int, gy: Int): Int = {
              val p = ((gy * h / 8) * w + (gx * w / 8)) * 3
              (rgb(p) & 0xFF) + (rgb(p + 1) & 0xFF) + (rgb(p + 2) & 0xFF)
            }
            var dh = 0L; var vh = 0L
            var gy = 0
            while (gy < 8) {
              var gx = 0
              while (gx < 7) {
                if (gs(gx, gy) > gs(gx + 1, gy)) dh |= 1L << (gy * 7 + gx)
                gx += 1
              }
              gy += 1
            }
            gy = 0
            while (gy < 7) {
              var gx = 0
              while (gx < 8) {
                if (gs(gx, gy) > gs(gx, gy + 1)) vh |= 1L << (gy * 8 + gx)
                gx += 1
              }
              gy += 1
            }
            (a.asset_id, dh, vh)
          }
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong))
      .toDF("id", "dh", "vh").distinct()
    val wsized = wide.groupBy(col("dh"), col("vh")).agg(count(lit(1)).as("n"))
    val ws = wsized.agg(count(lit(1)).as("buckets"),
      max(col("n")).as("max_bucket"),
      sum(col("n") * (col("n") - 1) / 2).as("pair_occurrences"))
      .collect().head
    println(s"  WIDE buckets=${ws.get(0)} max=${ws.get(1)} pairs=${ws.get(2)}")
    spark.stop()
  }
}
