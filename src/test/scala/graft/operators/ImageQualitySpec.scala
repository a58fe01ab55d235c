package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.multimodal.{MediaAsset, MultimodalOps}

/** Image quality metrics (m10 operator): bright/dark/contrast screens
  * over REAL decoded pixels — verified with planted white, black, and
  * flat-gray images at the production thresholds (the gate exercises
  * in-range thresholds on the corpus). */
class ImageQualitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def img(id: Long, seed: Array[Byte], w: Int = 8, h: Int = 4)
      : MediaAsset =
    MediaAsset(id, "image", MultimodalOps.syntheticBmp(seed, w, h), "s")

  test("white, black, flat, and textured images classify correctly") {
    import spark.implicits._
    val assets = Seq(
      img(1L, Array[Byte](-1)),           // all 0xFF: white (gray 765)
      img(2L, Array[Byte](0)),            // all 0x00: black (gray 0)
      img(3L, Array[Byte](100)),          // flat mid-gray (gray 300)
      img(4L, "varied pixel Text 0123".getBytes("UTF-8"))).toDS()
    val m = MultimodalOps.imageQualityMetrics(assets)
      .collect().map(q => q.asset_id -> q).toMap

    assert(m(1L).bright_cnt == 32 && m(1L).dark_cnt == 0)
    assert(m(1L).gray_sum == 32L * 765 && m(1L).low_quality) // mostly bright

    assert(m(2L).dark_cnt == 32 && m(2L).gray_sum == 0L)
    assert(m(2L).low_quality) // mostly dark

    assert(m(3L).bright_cnt == 0 && m(3L).dark_cnt == 0)
    assert(m(3L).min_gray == 300 && m(3L).max_gray == 300)
    assert(m(3L).low_quality) // zero contrast

    assert(!m(4L).low_quality)
    assert(m(4L).max_gray - m(4L).min_gray >= 30)
  }

  test("counts come from DECODED pixels (BMP padding never leaks in)") {
    import spark.implicits._
    // w=13 pads each BMP row with 3 zero bytes; a decoder bug that
    // counted padding as pixels would inflate dark_cnt and n_pixels
    val assets = Seq(img(5L, Array[Byte](-1), w = 13, h = 3)).toDS()
    val q = MultimodalOps.imageQualityMetrics(assets).collect().head
    assert(q.n_pixels == 39 && q.bright_cnt == 39 && q.dark_cnt == 0)
  }
}
