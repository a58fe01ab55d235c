package graft

import org.apache.spark.sql.functions._

/** Manual: measure pruned-probe recall for p34 (vs float brute force)
  * and p33 (vs full probe) per sf, to size the gate thresholds.
  * Run: `sbt "Test/runMain graft.TuneP34"`. */
object TuneP34 {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    import graft.operators.VectorOps
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val dir = s"/root/testdata/sf$sf"
      val all = Tables.table(spark, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val hist = IvfIndex.histSplit(all)
      val delta = IvfIndex.deltaSplit(all).filter(col("id") < 250)
      val idx = IvfIndex.ensureHist(spark, dir)
      for (nprobe <- Seq(3, 4); band <- Seq(3, 6)) {
        val pruned = VectorOps.ivfPqProbe(delta, idx, k = 3, nprobe = nprobe,
          rescoreK = band, rescoreCorpus = Some(hist))
          .select("query_id", "neighbor_id")
        val floatExact = VectorOps.bruteForceTopK(delta, hist, k = 3)
          .select("query_id", "neighbor_id")
        val nHit = pruned.join(floatExact,
          Seq("query_id", "neighbor_id"), "left_semi").count()
        val nF = floatExact.count()
        println(f"[p34] sf$sf nprobe=$nprobe band=$band recall=${nHit.toDouble / nF}%.3f ($nHit/$nF)")
      }
    }
    spark.stop()
  }
}
