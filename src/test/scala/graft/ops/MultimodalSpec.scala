package graft.ops

import graft.SparkSuite
import graft.ops.Multimodal.{MediaFeatures, MediaRecord}

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private def rec(id: Long, mtype: String, n: Int) =
    MediaRecord(id, mtype, Array.tabulate(n)(i => (i % 251).toByte),
      Map("src" -> "test"))

  test("extractFeatures preserves ids and produces the typed feature schema") {
    val ds = Seq(rec(1, "image", 5000), rec(2, "video", 12000),
      rec(3, "audio", 800)).toDS()
    val out: Seq[MediaFeatures] =
      Multimodal.extractFeatures(ds, batchSize = 2).collect().toSeq
        .sortBy(_.media_id)
    assert(out.map(_.media_id) == Seq(1L, 2L, 3L))
    assert(out.map(_.n_bytes) == Seq(5000L, 12000L, 800L))
    assert(out(1).n_frames == 13) // video: n/1000 + 1
    assert(out(0).n_frames == 1)
    assert(out.forall(_.embedding.length == 8))
  }

  test("stub decode is deterministic") {
    val a = Multimodal.extractFeatures(Seq(rec(7, "image", 999)).toDS())
      .collect().head
    val b = Multimodal.extractFeatures(Seq(rec(7, "image", 999)).toDS())
      .collect().head
    assert(a == b || (a.media_id == b.media_id &&
      a.embedding.toSeq == b.embedding.toSeq && a.width == b.width))
  }

  test("a real PNG payload decodes to its true dimensions and pixel embedding") {
    val png = Multimodal.encodePng(37, 23, seed = 42L)
    // it is a genuine PNG container
    assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte,
      'G'.toByte))
    val ds = Seq(MediaRecord(11L, "image", png, Map.empty)).toDS()
    val f = Multimodal.extractFeatures(ds).collect().head
    assert(f.width == 37 && f.height == 23)
    assert(f.n_bytes == png.length.toLong && f.n_frames == 1)
    assert(f.embedding.length == 8)
    // embedding comes from the decoded pixels: re-encoding the same image
    // reproduces it; a different seed (different pixels) changes it
    val f2 = Multimodal.extractFeatures(
      Seq(MediaRecord(12L, "image", Multimodal.encodePng(37, 23, 42L),
        Map.empty)).toDS()).collect().head
    assert(f.embedding.toSeq == f2.embedding.toSeq)
    val f3 = Multimodal.extractFeatures(
      Seq(MediaRecord(13L, "image", Multimodal.encodePng(37, 23, 43L),
        Map.empty)).toDS()).collect().head
    assert(f.embedding.toSeq != f3.embedding.toSeq)
  }

  test("direct WAV encode/parse match the JDK registry path exactly") {
    // encode: byte-identical to AudioSystem.write's canonical WAV
    val wav = Multimodal.encodeWav(500, 8000, 42L)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(wav.drop(44)), fmt, 500L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    assert(java.util.Arrays.equals(bos.toByteArray, wav),
      "direct RIFF emit must be byte-identical to the JDK writer")
    // decode: direct parser and registry agree on format and samples
    val (f1, s1) = Multimodal.decodeWavPcm16(wav).get
    val (f2, s2) = Multimodal.decodeAudioViaRegistry(wav).get
    assert(s1.toSeq == s2.toSeq)
    assert(f1.getSampleRate == f2.getSampleRate &&
      f1.getChannels == f2.getChannels &&
      f1.getSampleSizeInBits == f2.getSampleSizeInBits)
    // non-WAV payloads are declined by the direct parser (registry's job)
    assert(Multimodal.decodeWavPcm16("RIFFxxxxAVI ".getBytes).isEmpty)
    assert(Multimodal.decodeWavPcm16(Array.empty[Byte]).isEmpty)
  }

  test("a real WAV payload decodes to its true format, frames, and PCM sum") {
    val wav = Multimodal.encodeWav(nSamples = 1000, sampleRate = 16000,
      seed = 5L)
    // it is a genuine RIFF/WAVE container
    assert(wav.take(4).toSeq == "RIFF".getBytes("UTF-8").toSeq)
    val f = Multimodal.extractFeatures(
      Seq(MediaRecord(31L, "audio", wav, Map.empty)).toDS()).collect().head
    assert(f.sample_rate == 16000 && f.channels == 1 && f.n_frames == 1000)
    assert(f.duration_ms == 62L) // floor(1000 * 1000 / 16000)
    // the PCM sum only matches if every decoded sample is bit-exact
    val expected = (0 until 1000)
      .map(i => (5L * 31 + i.toLong * 7919) % 4096 - 2048).sum
    assert(f.pcm_sum == expected)
    assert(f.embedding.length == 8)
    // embedding comes from the decoded samples: same seed reproduces it,
    // a different seed (different PCM) changes it
    val f2 = Multimodal.extractFeatures(
      Seq(MediaRecord(32L, "audio", Multimodal.encodeWav(1000, 16000, 5L),
        Map.empty)).toDS()).collect().head
    assert(f.embedding.toSeq == f2.embedding.toSeq)
    val f3 = Multimodal.extractFeatures(
      Seq(MediaRecord(33L, "audio", Multimodal.encodeWav(1000, 16000, 6L),
        Map.empty)).toDS()).collect().head
    assert(f.embedding.toSeq != f3.embedding.toSeq)
  }

  test("an undecodable audio payload falls back to the stub, never throws") {
    val garbage = MediaRecord(41L, "audio",
      Array.tabulate(600)(i => (i % 251).toByte), Map.empty)
    val truncated = MediaRecord(42L, "audio",
      Multimodal.encodeWav(500, 8000, 1L).take(20), Map.empty)
    val out = Multimodal.extractFeatures(Seq(garbage, truncated).toDS())
      .collect().sortBy(_.media_id)
    assert(out.length == 2)
    assert(out.forall(_.embedding.length == 8))
    assert(out.forall(_.sample_rate == 0)) // stub features, not fake audio
  }

  test("an undecodable image payload falls back to the stub, never throws") {
    val garbage = MediaRecord(21L, "image",
      Array.tabulate(500)(i => (i % 251).toByte), Map.empty)
    val truncated = MediaRecord(22L, "image",
      Multimodal.encodePng(20, 20, 1L).take(30), Map.empty)
    val out = Multimodal.extractFeatures(Seq(garbage, truncated).toDS())
      .collect().sortBy(_.media_id)
    assert(out.length == 2) // both rows survive with stub features
    assert(out.forall(_.embedding.length == 8))
  }

  test("sampleFrames explodes a video into evenly spaced frame rows") {
    val ds = Seq(rec(5, "video", 12000)).toDS() // 13 frames × 40ms = 520ms
    val frames = Multimodal.sampleFrames(ds, everyMs = 100).collect()
      .sortBy(_.frame_idx)
    assert(frames.length == 6) // t = 0,100,...,500
    assert(frames.map(_.t_ms).toSeq == Seq(0L, 100L, 200L, 300L, 400L, 500L))
    assert(frames.forall(_.media_id == 5L))
    assert(frames.forall(_.embedding.length == 8))
    // frame embeddings vary by timestamp (per-frame, not per-media)
    assert(frames.map(_.embedding.toSeq).distinct.length > 1)
  }

  test("a real animated GIF decodes frame-by-frame with bit-exact gray values") {
    val gif = Multimodal.encodeGif(20, 14, nFrames = 3, seed = 9L)
    // it is a genuine GIF container
    assert(gif.take(3).toSeq == "GIF".getBytes("UTF-8").toSeq)
    // extractFeatures: a video-typed GIF payload yields REAL features
    val f = Multimodal.extractFeatures(
      Seq(MediaRecord(51L, "video", gif, Map.empty)).toDS()).collect().head
    assert(f.width == 20 && f.height == 14 && f.n_frames == 3)
    // sampleFrames decodes every frame; the integer luminance witness must
    // match the encoding formula exactly — only a bit-exact palette
    // round-trip can produce it
    val frames = Multimodal.sampleFrames(
      Seq(MediaRecord(51L, "video", gif, Map.empty)).toDS(),
      everyMs = 40, frameMs = 40).collect().sortBy(_.frame_idx)
    assert(frames.length == 3)
    def expected(fi: Int): Long =
      (for { x <- 0 until 20; y <- 0 until 14 }
        yield 1000L * java.lang.Math.floorMod(9L * 31 + x * 7 + y * 13 + fi * 101,
          256)).sum
    assert(frames.map(_.lum_milli_sum).toSeq == (0 until 3).map(expected),
      "per-frame luminance witness diverged from the encoding formula")
    // embeddings come from the real per-frame pixels: all frames differ
    assert(frames.map(_.embedding.toSeq).distinct.length == 3)
  }

  test("resizeTo stamps target dimensions without touching the payload") {
    val out = Multimodal.resizeTo(Seq(rec(9, "image", 100)).toDS(), 224, 224)
      .collect().head
    assert(out.meta("resize_w") == "224" && out.meta("resize_h") == "224")
    assert(out.meta("src") == "test") // original metadata kept
    assert(out.payload.length == 100)
  }

  test("asMedia wraps any binary column into the media schema") {
    val df = Seq((1L, "hello")).toDF("id", "txt")
      .withColumn("payload", org.apache.spark.sql.functions
        .encode(org.apache.spark.sql.functions.col("txt"), "UTF-8"))
    val m = Multimodal.asMedia(df, "id", "payload", "image")
    assert(m.schema.fieldNames.toSeq ==
      Seq("media_id", "media_type", "payload", "meta"))
  }

  private def grayPng(w: Int, h: Int, level: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = level(x, y)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("aHash is a perceptual hash: brightness-shift invariant, content-sensitive") {
    // horizontal gradient, channels capped at 200 so +50 cannot saturate
    val base = grayPng(32, 24, (x, _) => x * 6)
    val bright = grayPng(32, 24, (x, _) => x * 6 + 50)
    val inverse = grayPng(32, 24, (x, _) => 200 - x * 6)
    val hb = Multimodal.imageAHashOf(base).get
    assert(hb.length == 16 && hb.matches("[0-9a-f]{16}"))
    // a global brightness shift moves every sample AND the mean equally —
    // bit-for-bit the same hash (what byte-level hashing can never give)
    assert(Multimodal.imageAHashOf(bright).get == hb)
    // mirrored content flips the bit pattern — not a constant function
    assert(Multimodal.imageAHashOf(inverse).get != hb)
    // not an image → None, never throws
    assert(Multimodal.imageAHashOf("plain text".getBytes("UTF-8")).isEmpty)
  }

  private def wavOf(samples: Array[Short]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audio fingerprint is gain-invariant and content-sensitive") {
    val samples = Array.tabulate(640)(i =>
      (((i * 7919 + 13) % 4096) - 2048).toShort)
    val fp = Multimodal.audioFingerprintOf(wavOf(samples)).get
    assert(fp.length == 8 && fp.matches("[0-9a-f]{8}"))
    // doubling the volume scales every frame energy by 4 — the delta-sign
    // pattern (and so the fingerprint) is untouched
    val louder = samples.map(s => (s * 2).toShort)
    assert(Multimodal.audioFingerprintOf(wavOf(louder)).get == fp)
    // different content → different fingerprint
    val other = Array.tabulate(640)(i =>
      (((i * 104729 + 7) % 4096) - 2048).toShort)
    assert(Multimodal.audioFingerprintOf(wavOf(other)).get != fp)
    // too short for frame structure, or not audio at all → None
    assert(Multimodal.audioFingerprintOf(wavOf(Array.fill(16)(1.toShort))).isEmpty)
    assert(Multimodal.audioFingerprintOf("noise".getBytes("UTF-8")).isEmpty)
  }
}
