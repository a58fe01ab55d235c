package graft

import org.apache.spark.sql.functions._

/** Manual tuning harness for p07: stage-by-stage cost of
  * simhashPairs(poly=true) vs the xxhash variant at sf0.1.
  * Run: `sbt "Test/runMain graft.TuneSimhash"`. */
object TuneSimhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val dir = "/root/testdata/sf0.1"
    val d = Tables.table(spark, dir, "documents")
    def time(tag: String)(f: => Long): Unit = {
      // warm once (capturing the count — interpolating `f` in the
      // println would re-run the whole workload a fifth time), then
      // median of 3
      val n = f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag: ${ts.sorted.apply(1)}%.2fs (n=$n)")
    }
    time("sig only (poly)") {
      d.select(graft.operators.DedupOps.simhashPoly(
        split(col("text"), " ")).as("sig")).agg(sum(col("sig"))).count()
    }
    time("sig only (xxhash)") {
      d.select(graft.operators.DedupOps.simhash(
        split(col("text"), " ")).as("sig")).agg(sum(col("sig"))).count()
    }
    time("full pairs (poly)") {
      graft.operators.DedupOps.simhashPairs(d, "doc_id", "text",
        maxDist = 3, poly = true).count()
    }
    time("full pairs (xxhash)") {
      graft.operators.DedupOps.simhashPairs(d, "doc_id", "text",
        maxDist = 3, poly = false).count()
    }
    spark.stop()
  }
}
