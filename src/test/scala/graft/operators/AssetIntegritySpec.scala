package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.multimodal.{MediaAsset, MultimodalOps}

/** Asset integrity screen (m11 operator): corrupt payloads quarantine
  * per-row instead of killing the stage, across modalities. */
class AssetIntegritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("corrupt, mislabeled, and healthy assets each get the right verdict") {
    import spark.implicits._
    val bmp = MultimodalOps.syntheticBmp("pix".getBytes("UTF-8"), 8, 4)
    val wav = MultimodalOps.syntheticWav("pcm".getBytes("UTF-8"), 50, 8000)
    val assets = Seq(
      MediaAsset(1L, "image", bmp, "s"),                 // healthy image
      MediaAsset(2L, "image", bmp.take(10), "s"),        // truncated header
      MediaAsset(3L, "audio", wav, "s"),                 // healthy audio
      MediaAsset(4L, "audio", bmp, "s"),                 // mislabeled content
      MediaAsset(5L, "audio", wav.take(30), "s"),        // truncated audio
      MediaAsset(6L, "text", "hi".getBytes("UTF-8"), "s") // no decoder
    ).toDS()
    val m = MultimodalOps.assetIntegrity(assets)
      .collect().map(v => v.asset_id -> v).toMap
    assert(m(1L).decode_ok && m(3L).decode_ok)
    assert(!m(2L).decode_ok && !m(4L).decode_ok && !m(5L).decode_ok &&
      !m(6L).decode_ok)
    // the verdict names the failure class for quarantine triage
    assert(m(2L).error_class.nonEmpty && m(4L).error_class.nonEmpty)
    // and the screen processed ALL rows (nothing threw through)
    assert(m.size == 6)
  }
}
