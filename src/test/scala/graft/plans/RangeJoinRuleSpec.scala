package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class RangeJoinRuleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def withWidth[T](w: String)(f: => T): T = {
    spark.conf.set(RangeJoinRewrite.WidthKey, w)
    try f finally spark.conf.unset(RangeJoinRewrite.WidthKey)
  }

  private val points = (0L until 1000L).map(i => (i, i * 13 % 997)).toDF("pid", "p")
  private val intervals = (0L until 50L).map(i => (i, i * 20L, i * 20L + 35L))
    .toDF("iv", "lo", "hi")

  private def naive = points.join(intervals,
    col("p") >= col("lo") && col("p") < col("hi"))

  test("rule rewrites a plain range join to a bucketed equi-join (no BNLJ)") {
    withWidth("20") {
      val plan = physical(naive)
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"expected bucketed equi-join, got:\n$plan")
      assert(plan.contains("__graft_bucket"), s"marker column missing:\n$plan")
    }
  }

  test("rewritten join returns exactly the naive join's rows") {
    val expected = naive.select("pid", "iv").as[(Long, Long)].collect().toSet
    val got = withWidth("20") {
      naive.select("pid", "iv").as[(Long, Long)].collect().toSet
    }
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("inclusive/exclusive and flipped operand variants all rewrite exactly") {
    val variants = Seq(
      points.join(intervals, col("p") > col("lo") && col("p") <= col("hi")),
      points.join(intervals, col("lo") <= col("p") && col("hi") > col("p")),
      points.join(intervals, col("p") >= col("lo") && col("hi") >= col("p")))
    variants.foreach { v =>
      val expected = v.select("pid", "iv").as[(Long, Long)].collect().toSet
      withWidth("20") {
        assert(!physical(v).contains("BroadcastNestedLoopJoin"))
        assert(v.select("pid", "iv").as[(Long, Long)].collect().toSet == expected)
      }
    }
  }

  test("rule leaves equi-joins and non-range joins alone") {
    withWidth("20") {
      val equi = points.join(intervals, col("p") === col("lo"))
      assert(!physical(equi).contains("__graft_bucket"))
      val oneSided = points.join(intervals, col("p") >= col("lo"))
      assert(!physical(oneSided).contains("__graft_bucket"))
    }
  }

  test("rule is inert without the width conf") {
    assert(!physical(naive).contains("__graft_bucket"))
  }

  test("fractional bounds and extra conjuncts stay exact") {
    val fp = Seq(0.5, 9.9, 10.2, 10.6, 25.0).toDF("p")
      .withColumn("tag", lit("x"))
    val fiv = Seq((0.0, 10.5, "i1"), (20.0, 30.0, "i2"), (5.0, 5.0, "empty"))
      .toDF("lo", "hi", "ivtag")
    val j = fp.join(fiv, col("p") >= col("lo") && col("p") < col("hi") &&
      col("ivtag") =!= col("tag"))
    val expected = j.select("p", "ivtag").as[(Double, String)].collect().toSet
    withWidth("10") {
      assert(!physical(j).contains("BroadcastNestedLoopJoin"))
      assert(j.select("p", "ivtag").as[(Double, String)].collect().toSet == expected)
    }
    assert(expected == Set((0.5, "i1"), (9.9, "i1"), (10.2, "i1"), (25.0, "i2")))
  }
}
