package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Z-order layout key (q57): the Morton interleave must match an
  * independent bit-loop reference, be a bijection on the bucket grid,
  * and reduce to bit-spreading on the axes. */
class LayoutOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def refZ(bx: Long, by: Long, bits: Int): Long =
    (0 until bits).map(i =>
      (((bx >> i) & 1L) << (2 * i)) | (((by >> i) & 1L) << (2 * i + 1))).sum

  test("interleave matches the reference bit loop") {
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L), (255L, 255L),
      (170L, 85L), (128L, 1L))
    val got = pairs.toDF("bx", "by")
      .select(col("bx"), col("by"),
        LayoutOps.zorderKey(col("bx"), col("by"), bits = 8).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (bx, by, z) =>
      assert(z == refZ(bx, by, 8), s"($bx,$by)")
    }
  }

  test("bijection on the full 16x16 grid (bits=4): z is exactly 0..255") {
    val grid = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val zs = grid.toDF("bx", "by")
      .select(LayoutOps.zorderKey(col("bx"), col("by"), bits = 4).as("z"))
      .collect().map(_.getLong(0)).toSet
    assert(zs == (0L until 256L).toSet)
  }

  test("axes reduce to bit-spreading: z(x,0) even bits, z(0,y)=2*z(y,0)") {
    val xs = Seq(1L, 2L, 7L, 200L)
    val rows = xs.toDF("v")
      .select(LayoutOps.zorderKey(col("v"), lit(0L), bits = 8).as("zx"),
        LayoutOps.zorderKey(lit(0L), col("v"), bits = 8).as("zy"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    rows.foreach { case (zx, zy) =>
      assert((zx & 0xAAAAAAAAL) == 0L, "x must occupy even bits only")
      assert(zy == 2 * zx)
    }
  }

  test("the key is a per-row projection: no Exchange before an output sort") {
    val df = Seq((1L, 2L)).toDF("bx", "by")
      .select(LayoutOps.zorderKey(col("bx"), col("by")).as("z"))
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
