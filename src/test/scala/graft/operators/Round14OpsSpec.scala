package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Round-14 optimization-round pins. */
class Round14OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("reliable checkpoint option (spark.graft.checkpoint.dir) routes " +
      "the iterative operators' lineage cuts to durable files with " +
      "identical results") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (3L, 1L))
      .toDF("a", "b")
    val local = ClusterOps.connectedComponents(edges, "a", "b")
      .orderBy("node").as[(Long, Long)].collect().toSeq
    val ranksLocal = GraphOps.pageRank(edges, "a", "b", iters = 9,
        checkpointEvery = 2)
      .orderBy("node").as[(Long, Long)].collect().toSeq

    val dir = java.nio.file.Files
      .createTempDirectory("graft-reliable-ckpt").toString
    spark.conf.set(Checkpoints.DirConf, dir)
    try {
      val reliable = ClusterOps.connectedComponents(edges, "a", "b")
        .orderBy("node").as[(Long, Long)].collect().toSeq
      assert(reliable === local)
      val ranksReliable = GraphOps.pageRank(edges, "a", "b", iters = 9,
          checkpointEvery = 2)
        .orderBy("node").as[(Long, Long)].collect().toSeq
      assert(ranksReliable === ranksLocal)
      // the cuts really went to the durable directory: the context's
      // checkpoint dir is a UUID subdir under ours, holding rdd-* data
      val ckptDir = spark.sparkContext.getCheckpointDir
      assert(ckptDir.isDefined && ckptDir.get.contains(
        new java.io.File(dir).getName),
        s"checkpoint dir not under $dir: $ckptDir")
      val files = new java.io.File(new java.net.URI(ckptDir.get).getPath)
        .listFiles()
      assert(files != null && files.exists(_.getName.startsWith("rdd-")),
        "no rdd-* checkpoint data written under the reliable dir")
    } finally {
      spark.conf.unset(Checkpoints.DirConf)
      // the context keeps its checkpoint dir once set; harmless for
      // other suites (localCheckpoint ignores it), nothing to restore
    }
  }

  test("RemovePositions raises a descriptive error on a null token " +
      "element instead of an opaque NPE") {
    val df = Seq(Tuple1(Seq("a", "b"))).toDF("toks")
      .select(graft.functions.native.remove_positions(
        // element_at past the end yields NULL elements via transform
        org.apache.spark.sql.functions.expr(
          "array('x', cast(null as string))"),
        array(lit(9))).as("out"))
    val e = intercept[Exception] { df.collect() }
    def rootChain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(rootChain(e).exists(c =>
      c.getMessage != null && c.getMessage.contains("RemovePositions") &&
        c.getMessage.contains("null token element")),
      s"expected a descriptive RemovePositions error, got: $e")
  }
}
