package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.multimodal.{MediaAsset, MultimodalOps}

/** Letterbox/pillarbox detection (m16 operator): constructed bar
  * layouts over REAL BMP decode — the gate exercises the planted
  * corpus layouts; this spec pins the edge semantics (caps, blank
  * images, color anchoring) on hand-built pixel arrays. */
class LetterboxSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Build a w×h RGB seed: `f(r, x)` gives the per-pixel byte (all
    * three channels equal). */
  private def pixels(w: Int, h: Int)(f: (Int, Int) => Byte): Array[Byte] = {
    val seed = new Array[Byte](w * h * 3)
    var q = 0
    while (q < seed.length) {
      val pix = q / 3
      seed(q) = f(pix / w, pix % w)
      q += 1
    }
    seed
  }

  private def asset(id: Long, w: Int, h: Int)(f: (Int, Int) => Byte) =
    MediaAsset(id, "image", MultimodalOps.syntheticBmp(pixels(w, h)(f), w, h), "s")

  // content byte varies with position so content rows are never uniform
  private def content(r: Int, x: Int): Byte = (40 + (r * 31 + x * 7) % 50).toByte

  test("letterbox, pillarbox, combined, none, and blank classify " +
      "with exact bar counts") {
    import spark.implicits._
    val assets = Seq(
      // 2 top + 2 bottom bars
      asset(1L, 10, 8)((r, x) =>
        if (r < 2 || r >= 6) 16 else content(r, x)),
      // 3 left + 3 right pillars
      asset(2L, 12, 6)((r, x) =>
        if (x < 3 || x >= 9) 16 else content(r, x)),
      // 1-row letterbox + 2-col pillarbox combined
      asset(3L, 10, 8)((r, x) =>
        if (r < 1 || r >= 7 || x < 2 || x >= 8) 16 else content(r, x)),
      // no bars at all
      asset(4L, 10, 8)(content),
      // fully uniform (blank): caps keep top+bottom <= h, boxed=false
      asset(5L, 10, 8)((_, _) => 16)).toDS()
    val m = MultimodalOps.detectLetterbox(assets)
      .collect().map(a => a.asset_id -> a).toMap

    assert(m(1L).top_bars == 2 && m(1L).bottom_bars == 2)
    assert(m(1L).left_bars == 0 && m(1L).right_bars == 0)
    assert(m(1L).boxed && math.abs(m(1L).content_frac - 0.5) < 1e-12)

    assert(m(2L).top_bars == 0 && m(2L).bottom_bars == 0)
    assert(m(2L).left_bars == 3 && m(2L).right_bars == 3)
    assert(m(2L).boxed && math.abs(m(2L).content_frac - 0.5) < 1e-12)

    assert(m(3L).top_bars == 1 && m(3L).bottom_bars == 1)
    assert(m(3L).left_bars == 2 && m(3L).right_bars == 2)
    assert(m(3L).boxed)

    assert(m(4L).top_bars == 0 && m(4L).bottom_bars == 0 &&
      m(4L).left_bars == 0 && m(4L).right_bars == 0)
    assert(!m(4L).boxed && m(4L).content_frac == 1.0)

    assert(m(5L).top_bars == 8 && m(5L).bottom_bars == 0,
      "blank: top eats the whole height, bottom capped to 0")
    assert(!m(5L).boxed && m(5L).content_frac == 0.0)
  }

  test("bars must MATCH the outermost edge's color: a uniform row of " +
      "a different color ends the bar run") {
    import spark.implicits._
    // row 0 uniform gray 16, row 1 uniform gray 30 (still uniform,
    // different color), rows 2+ textured: top stops at 1
    val a = asset(7L, 10, 6)((r, x) =>
      if (r == 0) 16 else if (r == 1) 30 else content(r, x))
    val m = MultimodalOps.detectLetterbox(Seq(a).toDS()).collect().head
    assert(m.top_bars == 1, s"got ${m.top_bars}")
  }

  private def video(id: Long, w: Int, h: Int)(
      frames: ((Int, Int) => Byte)*): MediaAsset = {
    val bos = new java.io.ByteArrayOutputStream()
    frames.foreach(f =>
      bos.write(MultimodalOps.syntheticBmp(pixels(w, h)(f), w, h)))
    MediaAsset(id, "video", bos.toByteArray, "s")
  }

  test("video letterbox: consistent bars box the video, one full-bleed " +
      "title card zeroes the minimum and unboxes it") {
    import spark.implicits._
    def barred(n: Int)(r: Int, x: Int): Byte =
      if (r < n || r >= 8 - n) 16 else content(r, x)
    val assets = Seq(
      // consistent 2-row bars on all 3 frames
      video(1L, 16, 8)(barred(2), barred(2), barred(2)),
      // frame 0 full-bleed, frames 1-2 barred: NOT croppable
      video(2L, 16, 8)(content, barred(1), barred(1)),
      // no bars anywhere
      video(3L, 16, 8)(content, content, content)).toDS()
    val m = MultimodalOps.detectVideoLetterbox(assets)
      .collect().map(a => a.asset_id -> a).toMap

    assert(m(1L).n_frames == 3 && m(1L).top_bars == 2 &&
      m(1L).bottom_bars == 2 && m(1L).frames_boxed == 3 && m(1L).boxed)

    assert(m(2L).top_bars == 0 && m(2L).frames_boxed == 2 && !m(2L).boxed,
      "title card must veto the crop")

    assert(m(3L).frames_boxed == 0 && !m(3L).boxed)
  }

  test("video letterbox walks frames by their OWN BMP size header: " +
      "mixed-dimension frames parse, truncated payloads raise") {
    import spark.implicits._
    def barred(r: Int, x: Int): Byte = if (r < 2 || r >= 6) 16 else content(r, x)
    // frame 0 is 16x8, frame 1 is 24x8 — a fixed (w,h) stride would
    // misparse frame 1's header mid-pixel-data
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(MultimodalOps.syntheticBmp(pixels(16, 8)(barred), 16, 8))
    bos.write(MultimodalOps.syntheticBmp(pixels(24, 8)(barred), 24, 8))
    val mixed = MediaAsset(9L, "video", bos.toByteArray, "s")
    val m = MultimodalOps.detectVideoLetterbox(Seq(mixed).toDS())
      .collect().head
    assert(m.n_frames == 2 && m.top_bars == 2 && m.bottom_bars == 2 && m.boxed,
      s"mixed-dims video misparsed: $m")

    // trailing partial frame must raise, not silently drop
    val full = bos.toByteArray
    val cut = MediaAsset(10L, "video", full.dropRight(10), "s")
    val ex = intercept[org.apache.spark.SparkException] {
      MultimodalOps.detectVideoLetterbox(Seq(cut).toDS()).collect()
    }
    assert(ex.getMessage.contains("truncated") ||
      Option(ex.getCause).exists(_.getMessage.contains("truncated")))

    // bfSize = 0 is LEGAL per the BMP spec (the field is unreliable) —
    // the walk must fall back to the DIB header's geometry instead of
    // hard-failing the partition (round-12 ADVICE)
    val zeroed = full.clone()
    var off = 0
    while (off < zeroed.length) {
      val sz = (zeroed(off + 2) & 0xFF) | ((zeroed(off + 3) & 0xFF) << 8) |
        ((zeroed(off + 4) & 0xFF) << 16) | ((zeroed(off + 5) & 0xFF) << 24)
      zeroed(off + 2) = 0; zeroed(off + 3) = 0
      zeroed(off + 4) = 0; zeroed(off + 5) = 0
      off += sz
    }
    val z = MultimodalOps.detectVideoLetterbox(
      Seq(MediaAsset(11L, "video", zeroed, "s")).toDS()).collect().head
    assert(z.n_frames == 2 && z.top_bars == 2 && z.bottom_bars == 2 && z.boxed,
      s"bfSize=0 frames misparsed: $z")
  }

  test("planted corpus fixture round-trips through a real BMP decode " +
      "with the exact planted bar counts") {
    val out = MultimodalOps.detectLetterbox(
        MultimodalOps.letterboxAssets(spark, "/root/testdata/sf0.001"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { a =>
      val nb = math.min(a.asset_id % 5, 3L).toInt
      val np = if (a.asset_id % 7 < 2) 1 + (a.asset_id % 2).toInt else 0
      assert(a.top_bars == nb && a.bottom_bars == nb,
        s"asset ${a.asset_id}: expected $nb bars, got ${a.top_bars}/${a.bottom_bars}")
      assert(a.left_bars == np && a.right_bars == np,
        s"asset ${a.asset_id}: expected $np pillars, got ${a.left_bars}/${a.right_bars}")
    }
  }
}
