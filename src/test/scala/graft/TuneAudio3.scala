package graft

import org.apache.spark.sql.functions._
import graft.multimodal.MultimodalOps

/** Spark-side stage isolation for m04 at sf1. */
object TuneAudio3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val dir = if (args.nonEmpty) args(0) else "/root/repo/sf1"
    def time(tag: String)(f: => Long): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag: median ${ts.sorted.apply(1)}%.3fs")
    }
    time("read documents only") {
      graft.Tables.table(spark, dir, "documents").count()
    }
    time("documentsAsAssets") {
      MultimodalOps.documentsAsAssets(spark, dir).count()
    }
    time("audioAssets (encode)") {
      MultimodalOps.audioAssets(spark, dir).count()
    }
    time("extractAudioFeatures") {
      MultimodalOps.extractAudioFeatures(
        MultimodalOps.audioAssets(spark, dir)).count()
    }
    time("full m04 query") {
      PipelineQueries.queries("m04_audio")(spark, dir).count()
    }
    println("partitions: " + MultimodalOps.audioAssets(spark, dir).rdd.getNumPartitions)
  }
}
