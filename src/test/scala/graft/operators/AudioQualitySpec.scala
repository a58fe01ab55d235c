package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.multimodal.{MediaAsset, MultimodalOps}

/** Audio quality metrics (m09 operator): clipping/silence counts and
  * the drop flag over REAL decoded PCM — verified here with planted
  * full-scale-clipped and digitally-silent clips at the production
  * thresholds (the gate exercises in-range thresholds on the corpus). */
class AudioQualitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def clip(id: Long, seed: Array[Byte], n: Int = 100): MediaAsset =
    MediaAsset(id, "audio", MultimodalOps.syntheticWav(seed, n, 8000), "s")

  test("silence, clipping, and healthy clips classify correctly") {
    import spark.implicits._
    val assets = Seq(
      clip(1L, Array[Byte](0, 0)),                       // digital silence
      clip(2L, Array[Byte](-1, 127)),                    // 0x7FFF full-scale
      clip(3L, "normal audio text".getBytes("UTF-8"))).toDS() // mid-range
    val m = MultimodalOps.audioQualityMetrics(assets)
      .collect().map(q => q.asset_id -> q).toMap

    assert(m(1L).silence_cnt == 100 && m(1L).clip_cnt == 0)
    assert(m(1L).sum_sq == 0L && m(1L).low_quality)

    assert(m(2L).clip_cnt == 100 && m(2L).silence_cnt == 0)
    assert(m(2L).sum_sq == 100L * 32767L * 32767L && m(2L).low_quality)

    assert(m(3L).clip_cnt == 0 && m(3L).silence_cnt == 0)
    assert(!m(3L).low_quality)
  }

  test("negative samples count by magnitude (sign decode matters)") {
    import spark.implicits._
    // 0x8000 = -32768: the most negative sample must register as
    // clipped, not silent — an unsigned decode would read it as 32768
    // too, but a sign-dropping abs bug would zero it
    val assets = Seq(clip(4L, Array[Byte](0, -128), n = 10)).toDS()
    val q = MultimodalOps.audioQualityMetrics(assets).collect().head
    assert(q.clip_cnt == 10 && q.silence_cnt == 0)
    assert(q.sum_sq == 10L * 32768L * 32768L)
  }

  test("thresholds are parameters (the gate's in-range configuration)") {
    import spark.implicits._
    // ASCII 'ww' decodes to 0x7777 = 30583: above a 28000 clip
    // threshold, below the 32000 default
    val assets = Seq(clip(5L, "w".getBytes("UTF-8"), n = 20)).toDS()
    val strict = MultimodalOps.audioQualityMetrics(assets,
      clipThreshold = 28000, silenceThreshold = 26000).collect().head
    val default = MultimodalOps.audioQualityMetrics(assets).collect().head
    assert(strict.clip_cnt == 20 && default.clip_cnt == 0)
  }
}
