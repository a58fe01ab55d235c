package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Incremental micro-batch reads from a growing remote table. */
class RemoteStreamReadSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def withTable(test: (String, String) => Unit): Unit = {
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    val url = s"jdbc:derby:/tmp/graft_stream_${System.nanoTime()};create=true"
    val table = "GROWING"
    val c = DriverManager.getConnection(url)
    val st = c.createStatement()
    st.executeUpdate(
      s"CREATE TABLE $table (ID BIGINT NOT NULL, PAYLOAD VARCHAR(64))")
    st.close(); c.close()
    test(url, table)
  }

  private def insert(url: String, table: String, rows: (Long, String)*): Unit = {
    val c = DriverManager.getConnection(url)
    val ps = c.prepareStatement(s"INSERT INTO $table VALUES (?, ?)")
    rows.foreach { case (id, p) =>
      ps.setLong(1, id); ps.setString(2, p); ps.addBatch()
    }
    ps.executeBatch(); ps.close(); c.close()
  }

  test("readStream ships each remote insert batch exactly once") {
    withTable { (url, table) =>
      insert(url, table, 1L -> "a", 2L -> "b")
      val sdf = spark.readStream.format("graft-remote")
        .option("url", url).option("dbtable", table)
        .option("streamingcolumn", "ID")
        .load()
      val name = s"rstream_${System.nanoTime()}"
      val q = sdf.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        def got = spark.table(name)
          .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
        assert(got == Seq(1L -> "a", 2L -> "b"), s"first batch: $got")
        insert(url, table, 3L -> "c", 4L -> "d")
        q.processAllAvailable()
        assert(got == Seq(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"),
          s"after growth: $got")
        // no new rows -> no duplicate shipping
        q.processAllAvailable()
        assert(got.size == 4, s"duplicates after idle trigger: $got")
      } finally q.stop()
    }
  }

  test("backlog ranges split into numpartitions contiguous slices") {
    val opts = RemoteOptions(Map("url" -> "jdbc:derby:memory:x",
      "dbtable" -> "T", "streamingcolumn" -> "ID", "numpartitions" -> "4"))
    val stream = new RemoteMicroBatchStream(opts,
      RemoteSchema(Seq(RemoteField("ID", RemoteType.RInt8, nullable = false))),
      new org.apache.spark.sql.types.StructType(),
      new org.apache.spark.sql.types.StructType(), Nil)
    def preds(lo: Long, hi: Long): Seq[String] =
      stream.planInputPartitions(RemoteOffset(lo), RemoteOffset(hi))
        .map(_.asInstanceOf[RemotePartition].rangePredicate.get).toSeq
    // steady state: one partition
    assert(preds(10, 12) == Seq("\"ID\" > 10 AND \"ID\" <= 12"))
    // backlog: 4 contiguous slices covering (0, 100] exactly
    val backlog = preds(0, 100)
    assert(backlog == Seq(
      "\"ID\" > 0 AND \"ID\" <= 25", "\"ID\" > 25 AND \"ID\" <= 50",
      "\"ID\" > 50 AND \"ID\" <= 75", "\"ID\" > 75 AND \"ID\" <= 100"))
    // empty range: no partitions
    assert(stream.planInputPartitions(RemoteOffset(5), RemoteOffset(5)).isEmpty)
  }

  test("streaming read with numpartitions ships a backlog correctly") {
    withTable { (url, table) =>
      insert(url, table, (1L to 40L).map(i => i -> s"p$i"): _*)
      val sdf = spark.readStream.format("graft-remote")
        .option("url", url).option("dbtable", table)
        .option("streamingcolumn", "ID").option("numpartitions", "4")
        .load()
      val name = s"rstream_${System.nanoTime()}"
      val q = sdf.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val got = spark.table(name).collect().map(_.getLong(0)).sorted.toSeq
        assert(got == (1L to 40L), s"backlog rows: $got")
      } finally q.stop()
    }
  }

  test("streaming quality pipeline over a growing remote table") {
    // the federation-ingest story end-to-end: remote incremental source
    // -> per-row text analysis (token count, quality, langid, PII
    // redaction) -> sink; stateless ops run unchanged under streaming
    withTable { (url, table) =>
      import graft.operators.TextOps
      insert(url, table, 1L -> "the cat and the dog", 2L -> "x")
      val sdf = spark.readStream.format("graft-remote")
        .option("url", url).option("dbtable", table)
        .option("streamingcolumn", "ID")
        .load()
        .select(col("ID"),
          TextOps.tokenCount(col("PAYLOAD")).as("n_tok"),
          TextOps.langId(col("PAYLOAD")).as("lang"),
          TextOps.redactPii(concat(col("PAYLOAD"),
            lit(" mail a@b.example.org"))).as("red"))
        .filter(col("n_tok") >= 2)
      val name = s"rstream_${System.nanoTime()}"
      val q = sdf.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        insert(url, table, 3L -> "der hund und die katze nicht")
        q.processAllAvailable()
        val got = spark.table(name)
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
            r.getString(3))).sortBy(_._1).toSeq
        assert(got == Seq(
          (1L, 5, "en", "the cat and the dog mail <EMAIL>"),
          (3L, 6, "de", "der hund und die katze nicht mail <EMAIL>")),
          s"got: $got")
      } finally q.stop()
    }
  }

  test("maxrowspermicrobatch drains a backlog in bounded batches") {
    withTable { (url, table) =>
      // 100-row backlog, cap 30 -> 4 batches (30/30/30/10), offsets
      // checkpointed per batch
      insert(url, table, (1L to 100L).map(i => i -> s"p$i"): _*)
      val sdf = spark.readStream.format("graft-remote")
        .option("url", url).option("dbtable", table)
        .option("streamingcolumn", "ID")
        .option("maxrowspermicrobatch", "30")
        .load()
      val name = s"rstream_${System.nanoTime()}"
      val q = sdf.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val got = spark.table(name).collect().map(_.getLong(0)).sorted.toSeq
        assert(got == (1L to 100L), s"backlog rows: $got")
        // every committed batch advanced the offset by ≤ the cap
        val sq = q.asInstanceOf[org.apache.spark.sql.streaming.StreamingQuery]
        val batches = sq.recentProgress.toSeq
          .filter(_.numInputRows > 0)
        assert(batches.size == 4,
          s"expected 4 bounded batches, got ${batches.map(_.numInputRows).toSeq}")
        assert(batches.forall(_.numInputRows <= 30),
          s"batch sizes: ${batches.map(_.numInputRows).toSeq}")
        // steady state: new rows still ship, still bounded
        insert(url, table, 101L -> "tail")
        q.processAllAvailable()
        assert(spark.table(name).count() == 101)
      } finally q.stop()
    }
  }

  test("Trigger.AvailableNow honors maxrowspermicrobatch (composite read limit)") {
    withTable { (url, table) =>
      // AvailableNow wraps the read limit in a CompositeReadLimit; the
      // cap must survive the unwrap or the backfill runs as ONE batch
      insert(url, table, (1L to 100L).map(i => i -> s"p$i"): _*)
      val sdf = spark.readStream.format("graft-remote")
        .option("url", url).option("dbtable", table)
        .option("streamingcolumn", "ID")
        .option("maxrowspermicrobatch", "40")
        .load()
      val name = s"rstream_${System.nanoTime()}"
      val q = sdf.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try {
        assert(q.awaitTermination(60000), "AvailableNow query did not finish")
        val got = spark.table(name).collect().map(_.getLong(0)).sorted.toSeq
        assert(got == (1L to 100L), s"backfill rows: $got")
        val batches = q.recentProgress.toSeq.filter(_.numInputRows > 0)
        assert(batches.size == 3,
          s"expected 3 capped batches (40/40/20), got ${batches.map(_.numInputRows).toSeq}")
        assert(batches.forall(_.numInputRows <= 40),
          s"batch sizes: ${batches.map(_.numInputRows).toSeq}")
      } finally q.stop()
    }
  }

  test("streamingstart skips the backlog; filters push into each batch") {
    withTable { (url, table) =>
      insert(url, table, 1L -> "old", 2L -> "old")
      val sdf = spark.readStream.format("graft-remote")
        .option("url", url).option("dbtable", table)
        .option("streamingcolumn", "ID")
        .option("streamingstart", "2")
        .load()
        .filter(col("PAYLOAD") =!= "drop")
      val name = s"rstream_${System.nanoTime()}"
      val q = sdf.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        assert(spark.table(name).count() == 0, "backlog should be skipped")
        insert(url, table, 3L -> "new", 4L -> "drop")
        q.processAllAvailable()
        val got = spark.table(name)
          .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
        assert(got == Seq(3L -> "new"), s"got: $got")
      } finally q.stop()
    }
  }
}
