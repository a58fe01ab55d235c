package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.multimodal.{MediaAsset, MultimodalOps}

/** Silence-trim detection (m17 operator): leading/trailing |s| <
  * threshold runs over REAL WAV decode — constructed pad layouts here,
  * the planted corpus layouts in the gate. */
class SilenceTrimSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Build a mono 16-bit WAV whose sample i is `f(i)`. */
  private def wav(id: Long, n: Int)(f: Int => Int): MediaAsset = {
    val seed = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = f(i)
      seed(2 * i) = (s & 0xFF).toByte
      seed(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    MediaAsset(id, "audio",
      MultimodalOps.syntheticWav(seed, n, 8000), "s")
  }

  private def loud(i: Int): Int = 5000 + (i * 37) % 2000

  test("leading, trailing, both-ends, none, and all-silent classify " +
      "with exact pad counts") {
    import spark.implicits._
    val assets = Seq(
      wav(1L, 100)(i => if (i < 15) 0 else loud(i)),
      wav(2L, 100)(i => if (i >= 80) 0 else loud(i)),
      wav(3L, 100)(i => if (i < 10 || i >= 90) 3 else loud(i)),
      wav(4L, 100)(loud),
      wav(5L, 100)(_ => 0)).toDS()
    val m = MultimodalOps.trimSilence(assets, threshold = 1000)
      .collect().map(a => a.asset_id -> a).toMap

    assert(m(1L).lead_silence == 15 && m(1L).tail_silence == 0)
    assert(m(1L).kept_samples == 85 && !m(1L).silent)

    assert(m(2L).lead_silence == 0 && m(2L).tail_silence == 20)

    assert(m(3L).lead_silence == 10 && m(3L).tail_silence == 10)
    assert(math.abs(m(3L).kept_frac - 0.8) < 1e-12)

    assert(m(4L).lead_silence == 0 && m(4L).tail_silence == 0 &&
      m(4L).kept_frac == 1.0)

    assert(m(5L).lead_silence == 100 && m(5L).tail_silence == 0,
      "all-silent: lead eats everything, tail capped to 0")
    assert(m(5L).silent && m(5L).kept_frac == 0.0)
  }

  test("negative samples count by magnitude: a loud negative sample " +
      "ends the pad run") {
    import spark.implicits._
    val a = wav(7L, 50)(i => if (i < 5) 0 else -20000)
    val m = MultimodalOps.trimSilence(Seq(a).toDS()).collect().head
    assert(m.lead_silence == 5 && m.kept_samples == 45)
  }

  test("planted corpus fixture round-trips through a real WAV decode " +
      "with the exact planted pad counts") {
    val out = MultimodalOps.trimSilence(
        MultimodalOps.silenceTrimAssets(spark, "/root/testdata/sf0.001"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { a =>
      val lead = (a.asset_id % 5).toInt * 8
      val tail = (a.asset_id % 3).toInt * 10
      assert(a.lead_silence == lead && a.tail_silence == tail,
        s"asset ${a.asset_id}: expected $lead/$tail, " +
          s"got ${a.lead_silence}/${a.tail_silence}")
    }
  }
}
