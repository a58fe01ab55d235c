package graft

import org.apache.spark.sql.functions._

/** Round-9 probe: where does p05_minhash_lsh's sf1 cost come from?
  * Reports banded-bucket stats, candidate volume, exact-dup structure.
  * Run: sbt "Test/runMain graft.TuneP05 /root/repo/sf1" */
object TuneP05 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/sf1")
    val spark = SparkTestSession.spark
    import spark.implicits._
    val d = Tables.table(spark, dir, "documents")
    println(s"docs: ${d.count()}")

    // exact-dup structure
    val byFp = d.groupBy(graft.operators.TextOps.fingerprint(col("text")).as("fp"))
      .agg(count(lit(1)).as("n"))
    val fps = byFp.agg(count(lit(1)), sum("n"), max("n"),
      sum(when(col("n") >= 2, col("n"))).as("dup_members")).collect().head
    println(s"distinct texts: ${fps.get(0)}  rows: ${fps.get(1)}  " +
      s"max group: ${fps.get(2)}  members in dup groups: ${fps.get(3)}")

    // banded bucket stats at the p05 config
    val withSh = d.select(col("doc_id").as("id"),
        graft.operators.DedupOps.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val banded = withSh.select(col("id"),
        posexplode(graft.functions.native.minhash_bands(col("sh"), 32, 4)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
    val buckets = banded.groupBy("band", "bh").agg(count(lit(1)).as("n"))
      .persist()
    val bs = buckets.agg(count(lit(1)), max("n"),
      sum(col("n") * (col("n") - 1) / 2).as("pairs_upper"),
      sum(when(col("n") > 1000, col("n"))).as("dropped_ids")).collect().head
    println(s"buckets: ${bs.get(0)}  max bucket: ${bs.get(1)}  " +
      s"sum n*(n-1)/2: ${bs.get(2)}  ids in >1000 buckets: ${bs.get(3)}")
    println("top buckets:")
    buckets.orderBy(col("n").desc).limit(10).collect()
      .foreach(r => println(s"  band=${r.get(0)} n=${r.get(2)}"))
    buckets.unpersist()

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val cands = graft.operators.LshJoin.candidates(
      banded, Seq("band", "bh"), 1000)
    time("candidates count")(println(s"  n_cands: ${cands.count()}"))
    time("full p05")(println(s"  n_pairs: ${graft.operators.DedupOps
      .minhashLshPairs(d, "doc_id", "text", tau = 0.7).count()}"))
    spark.stop()
  }
}
