package graft

import org.apache.spark.sql.functions._

/** Round-9 probe: p69 candidate volume and phase costs at a given SF.
  * Run: sbt "Test/runMain graft.TuneP69 /root/testdata/sf0.1" */
object TuneP69 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tau = 0.65
    val spark = SparkTestSession.spark
    val d = Tables.table(spark, dir, "documents")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val sets = d.select(col("doc_id").as("id"),
        graft.functions.native.shingle_hash_set(
          split(col("text"), " "), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .persist()
    time("sets count")(println(s"  docs: ${sets.count()}"))
    val toks = sets.select(col("id"), explode(col("sh")).as("t"))
    val freq = toks.groupBy(col("t")).agg(count(lit(1)).as("df"))
    time("freq count")(println(s"  distinct shingles: ${freq.count()}"))
    val prefix = toks.join(freq, "t")
      .groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("df"), col("t")))).as("ts"))
      .select(col("id"), transform(
          slice(col("ts"), lit(1),
            (size(col("ts")) - ceil(size(col("ts")) * tau) + 1).cast("int")),
          s => s.getField("t")).as("pre"))
    val banded = prefix.select(col("id"), explode(col("pre")).as("t"))
      .persist()
    time("banded count")(println(s"  prefix rows: ${banded.count()}"))
    val buckets = banded.groupBy("t").agg(count(lit(1)).as("n"))
    val bs = buckets.agg(max("n"), sum(col("n") * (col("n") - 1) / 2))
      .collect().head
    println(s"  max bucket: ${bs.get(0)}  pair occurrences: ${bs.get(1)}")
    val cands = graft.operators.LshJoin.candidates(
      banded, Seq("t"), Int.MaxValue)
    time("distinct candidates")(println(s"  n_cands: ${cands.count()}"))
    time("full p69")(println(s"  pairs: ${graft.operators.DedupOps
      .setSimJoinExact(d, "doc_id", "text", tau).count()}"))
    spark.stop()
  }
}
