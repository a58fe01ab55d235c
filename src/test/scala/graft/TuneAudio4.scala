package graft

import graft.multimodal.MultimodalOps

object TuneAudio4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val dir = "/root/repo/sf1"
    MultimodalOps.audioAssets(spark, dir).count() // warm encode path
    (1 to 40).foreach { i =>
      MultimodalOps.extractAudioFeatures(
        MultimodalOps.audioAssets(spark, dir)).count()
      println(s"pass $i done")
    }
  }
}
