package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.SampleOps

/** TABLESAMPLE pushdown (r18): df.sample over a remote table ships as
  * the deterministic hash-threshold predicate on `samplecolumn`. */
class RemoteSampleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def nation(extra: (String, String)*): DataFrame = {
    DerbyFixture.init
    var r = spark.read.format("graft-remote")
      .option("url", DerbyFixture.url).option("dbtable", "NATION")
    extra.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }

  private def hasSampleNode(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Sample")

  test("pushed sample selects exactly the hash-threshold subset, " +
    "no Spark-side Sample node") {
    val sampled = nation("samplecolumn" -> "N_NATIONKEY")
      .sample(withReplacement = false, fraction = 0.5, seed = 7L)
    assert(!hasSampleNode(sampled),
      "sample was not pushed: Sample node still in the plan")
    val got = sampled.select(col("N_NATIONKEY")).collect()
      .map(_.getInt(0)).sorted.toSeq
    // expected subset = the SAME arithmetic, applied to the full read
    val expected = nation()
      .filter(SampleOps.hashBucket(col("N_NATIONKEY"), 7L) <
        lit(SampleOps.threshold(0.5)))
      .select(col("N_NATIONKEY")).collect().map(_.getInt(0)).sorted.toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.size < 10) // a real, proper subset
    // reruns draw the identical rows (determinism is the contract)
    val again = nation("samplecolumn" -> "N_NATIONKEY")
      .sample(withReplacement = false, fraction = 0.5, seed = 7L)
      .select(col("N_NATIONKEY")).collect().map(_.getInt(0)).sorted.toSeq
    assert(again == got)
  }

  test("sample composes with filter pushdown and remote aggregation") {
    val df = nation("samplecolumn" -> "N_NATIONKEY")
      .sample(withReplacement = false, fraction = 0.5, seed = 7L)
      .filter(col("N_REGIONKEY") < 3)
      .agg(count(lit(1)).as("n"))
    val expected = nation()
      .filter(SampleOps.hashBucket(col("N_NATIONKEY"), 7L) <
        lit(SampleOps.threshold(0.5)))
      .filter(col("N_REGIONKEY") < 3).count()
    assert(df.collect().head.getLong(0) == expected)
  }

  test("declines without samplecolumn (Sample stays Spark-side)") {
    val sampled = nation()
      .sample(withReplacement = false, fraction = 0.5, seed = 7L)
    assert(hasSampleNode(sampled))
    // still executes (Bernoulli, just not wire-proportional)
    assert(sampled.count() <= 10)
  }

  test("declines replacement sampling and unknown sample columns") {
    val withRep = nation("samplecolumn" -> "N_NATIONKEY")
      .sample(withReplacement = true, fraction = 0.5, seed = 7L)
    assert(hasSampleNode(withRep))
    val badCol = nation("samplecolumn" -> "no_such_col")
      .sample(withReplacement = false, fraction = 0.5, seed = 7L)
    assert(hasSampleNode(badCol))
    assert(badCol.count() <= 10)
  }

  test("mdb dialect declines (no integer modulo), sqlite renders %") {
    assert(MdbDialect.sampleFilterSql("[k]", 0L, 5L, 1L).isEmpty)
    val sq = SqliteDialect.sampleFilterSql("\"k\"", 0L, 5L, 1L)
    assert(sq.exists(s => s.contains("%") && !s.contains("MOD(")))
    val de = DerbyDialect.sampleFilterSql("\"k\"", 0L, 5L, 1L)
    assert(de.exists(_.contains("MOD(")))
    // a nonzero lower bound renders the band form
    val band = DerbyDialect.sampleFilterSql("\"k\"", 3L, 5L, 1L).get
    assert(band.contains(">= 3") && band.contains("< 5"))
  }
}
