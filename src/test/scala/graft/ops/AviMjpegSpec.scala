package graft.ops

import java.awt.image.BufferedImage

import graft.SparkSuite

/** [[AviMjpeg]] — pure-JVM MJPEG/AVI round-trip and its wiring into the
  * [[Multimodal]] decode/frame-sampling pipeline. */
class AviMjpegSpec extends SparkSuite {
  import spark.implicits._

  /** Flat-color frames: JPEG's DC-only case, so decoded pixels stay close
    * to the source and frame identity is testable through the lossy hop. */
  private def flatFrames(colors: Seq[Int], w: Int = 64, h: Int = 48) =
    colors.map { c =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      try { g.setColor(new java.awt.Color(c)); g.fillRect(0, 0, w, h) }
      finally g.dispose()
      img
    }

  test("encode → decode round-trips frame count, dims, and frame clock") {
    val src = flatFrames(Seq(0x202020, 0x808080, 0xe0e0e0, 0x404040, 0xa0a0a0))
    val avi = AviMjpeg.encode(src, fps = 25)
    val Some((us, frames)) = AviMjpeg.decode(avi)
    assert(us == 40000L, "25 fps = 40000 µs per frame from avih")
    assert(frames.size == 5)
    assert(frames.forall(f => f.getWidth == 64 && f.getHeight == 48))
    // gray levels survive the JPEG hop: decoded mean luminance within a
    // few steps of the planted flat value, and frames stay DISTINCT
    val lum = frames.map(f => (f.getRGB(32, 24) & 0xff))
    Seq(0x20, 0x80, 0xe0, 0x40, 0xa0).zip(lum).foreach { case (want, got) =>
      assert(math.abs(want - got) <= 4, s"flat $want decoded as $got")
    }
  }

  test("non-AVI and truncated payloads are rejected, never thrown") {
    assert(AviMjpeg.decode("not a movie".getBytes).isEmpty)
    assert(AviMjpeg.decode(Array.empty[Byte]).isEmpty)
    val avi = AviMjpeg.encode(flatFrames(Seq(0x336699)), fps = 10)
    assert(AviMjpeg.decode(avi.take(40)).isEmpty, "header-only: no frames")
    // GIF payloads do not masquerade as AVI
    assert(AviMjpeg.decode(
      Multimodal.encodeGif(16, 16, nFrames = 2, seed = 7L)).isEmpty)
  }

  test("Multimodal.decode reports REAL dims and frame count for AVI video") {
    val avi = AviMjpeg.encode(
      flatFrames(Seq(0x111111, 0x999999, 0xdddddd), w = 80, h = 60), fps = 20)
    val rec = Multimodal.MediaRecord(7L, "video", avi, Map.empty)
    val f = Multimodal.decode(rec)
    assert(f.width == 80 && f.height == 60 && f.n_frames == 3,
      s"real decode, not the stub: $f")
  }

  test("sampleFrames uses the AVI's own frame clock and real pixels") {
    val avi = AviMjpeg.encode(
      flatFrames(Seq(0x101010, 0xf0f0f0, 0x101010, 0xf0f0f0)), fps = 10)
    val ds = Seq(Multimodal.MediaRecord(1L, "video", avi, Map.empty)).toDS()
    // 10 fps ⇒ 100 ms/frame, 400 ms total; sample every 100 ms ⇒ 4 frames
    val frames = Multimodal.sampleFrames(ds, everyMs = 100L)
      .orderBy("frame_idx").collect()
    assert(frames.length == 4)
    assert(frames.map(_.t_ms).toSeq == Seq(0L, 100L, 200L, 300L))
    assert(frames.forall(_.lum_milli_sum > 0L),
      "real pixel witness on every sampled frame — the stub path has none")
    // the alternating dark/bright pattern is visible in the witnesses
    val w = frames.map(_.lum_milli_sum)
    assert(w(0) < w(1) && w(2) < w(3) && w(1) > w(2))
  }
}
