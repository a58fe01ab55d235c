package graft.sources

/** Child-process half of the cross-process codec replay
  * (ScanCodecForkSpec): a SEPARATE JVM that knows nothing about the
  * parent's Spark session, reads the versioned JSON artifact from disk,
  * decodes it, executes it against the remote database, and writes the
  * result rows as sorted TSV — the distributed-execution strength of
  * the reference's protobuf codec (`common.rs:87-107` decodes on a
  * process that never saw the original plan object). */
object ScanCodecReplayChild {
  def main(args: Array[String]): Unit = {
    val Array(jsonPath, outPath) = args
    val json = java.nio.file.Files.readString(java.nio.file.Paths.get(jsonPath))
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val df = ScanCodec.execute(spark, ScanCodec.decode(json))
      val rows = df.collect()
        .map(_.toSeq.map(String.valueOf).mkString("\t")).sorted
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
        rows.mkString("\n"))
    } finally {
      // release the embedded DB so the parent could reboot it
      GraftConnectionPool.drainAll()
      spark.stop()
    }
  }
}
