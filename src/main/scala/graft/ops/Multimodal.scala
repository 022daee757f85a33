package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus the batch-iterator decode/feature-extract shape.
  *
  * IMAGE decode is REAL: the JDK's `javax.imageio` reads PNG/JPEG/GIF/BMP
  * payloads (zero new dependencies), yielding true width/height and a
  * deterministic pixel-derived embedding. AUDIO decode is REAL too:
  * `javax.sound.sampled` parses WAV/AIFF headers and 16-bit PCM frames,
  * yielding true sample-rate/channels/duration and a PCM-derived embedding.
  * MULTI-FRAME decode is real as well: ImageIO reads every frame of an
  * animated GIF ([[decodeFrames]]), and [[AviMjpeg]] decodes MJPEG/AVI —
  * a true video container whose frames are JPEGs — with its own frame
  * clock, so [[sampleFrames]] emits genuinely decoded per-frame pixels,
  * embeddings, and timing for GIF and AVI payloads. Only bitstream-coded
  * containers (mp4/H.264, webm/VP9 — the JDK ships no entropy codec)
  * stay behind the clearly-marked `stubDecode`; a payload that fails
  * every real decode falls back there too, so the pipeline never throws
  * on corrupt blobs. Swapping in a richer codec = replacing one function,
  * nothing else moves.
  */
object Multimodal {

  // one JVM-wide switch, set at class init (not per record/encode): the
  // ImageIO disk cache would otherwise create+delete a temp file per image
  javax.imageio.ImageIO.setUseCache(false)

  /** The media-record schema: one blob + typed metadata per row. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  case class MediaRecord(media_id: Long, media_type: String,
                         payload: Array[Byte], meta: Map[String, String])

  case class MediaFeatures(media_id: Long, media_type: String, n_bytes: Long,
                           width: Int, height: Int, n_frames: Int,
                           embedding: Array[Float],
                           sample_rate: Int = 0, channels: Int = 0,
                           duration_ms: Long = 0L, pcm_sum: Long = 0L)

  /** Real image decode via the JDK's ImageIO. None ⇒ the payload is not a
    * decodable image (wrong container, corrupt, or audio/video). The file
    * cache is disabled so executor threads never contend on temp files. */
  private[ops] def decodeImage(payload: Array[Byte])
  : Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload)))
    catch { case _: Exception => None }

  /** 8-dim image embedding: mean luminance (Rec. 601 weights) of 8 vertical
    * strips, centered on 0 — deterministic and computed from the REAL
    * decoded pixels (a stand-in for a vision model with the same data
    * flow). */
  private[ops] def stripEmbedding(img: java.awt.image.BufferedImage)
  : Array[Float] = {
    val w = img.getWidth; val h = img.getHeight
    val sums = new Array[Double](8); val counts = new Array[Long](8)
    // bulk row transfer: one getRGB call per ROW, not per pixel — the
    // per-pixel overload routes every call through the color-model
    // conversion indirection and was the dominant cost of the decode path
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val rgb = row(x)
        val lum = (((rgb >> 16) & 0xff) * 299L + ((rgb >> 8) & 0xff) * 587L +
          (rgb & 0xff) * 114L) / 1000.0
        val s = x * 8 / w
        sums(s) += lum; counts(s) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(8)(i =>
      if (counts(i) == 0) 0f
      else ((sums(i) / counts(i)) / 255.0 - 0.5).toFloat)
  }

  /** Deterministic real PNG: pixel (x, y) = a seed-keyed RGB pattern,
    * encoded through the JDK PNG writer. Used to synthesize genuine image
    * payloads for pipelines and tests (the decode side recovers the exact
    * dimensions and pixels). */
  def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    // write straight into the INT_RGB raster's backing array — identical
    // semantics to per-pixel setRGB for this image type (low 24 bits), but
    // one array fill instead of width*height color-model round-trips
    val data = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData
    var y = 0
    while (y < height) {
      val base = y * width
      var x = 0
      while (x < width) {
        data(base + x) = ((seed * 31 + x * 7 + y * 13) & 0xffffff).toInt
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Real multi-frame decode via ImageIO's frame API
    * (`ImageReader.getNumImages`/`read(i)`): every frame of an animated GIF
    * — the video-analog container the JDK ships a codec for. None ⇒ the
    * payload is not a frame-decodable image container. Frames written by
    * [[encodeGif]] are full-size with no disposal tricks, so `read(i)` IS
    * frame i (no composition step needed). */
  private[ops] def decodeFrames(payload: Array[Byte])
  : Option[IndexedSeq[java.awt.image.BufferedImage]] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val n = r.getNumImages(true)
            if (n <= 0) None else Some((0 until n).map(r.read(_)))
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => None }

  /** Exact integer pixel witness: Σ (299·R + 587·G + 114·B) over the frame
    * — 1000× the Rec. 601 luminance [[stripEmbedding]] averages, kept
    * divisionless so an oracle can recompute it bit-exactly from the
    * encoding formula (a float embedding alone cannot be hash-compared). */
  private[ops] def luminanceMilliSum(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    val row = new Array[Int](w)
    var sum = 0L
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val rgb = row(x)
        sum += ((rgb >> 16) & 0xff) * 299L + ((rgb >> 8) & 0xff) * 587L +
          (rgb & 0xff) * 114L
        x += 1
      }
      y += 1
    }
    sum
  }

  /** Perceptual average-hash (aHash) of a decoded image: sample an 8×8
    * grid of pixels (integer-spaced corners-inclusive positions
    * `x_i = i·(w−1) div 7`), take each sample's exact integer Rec. 601
    * milli-luminance (299R+587G+114B), and set bit (j·8+i) iff the
    * sample's luminance STRICTLY exceeds the grid mean (`lum·64 > Σ` —
    * cross-multiplied, no division). Packed MSB-first into 16 lowercase
    * hex chars. Every step is integer arithmetic over decoded pixels, so
    * an oracle that knows the pixel formula can replay the hash without
    * any image codec — which is what verifies the real ImageIO decode in
    * front of it. None ⇒ the payload is not a decodable image.
    *
    * The perceptual property: any luminance-order-preserving global edit
    * (brightness/contrast curves, format re-encode) keeps the bits, so
    * re-encoded or tone-mapped copies collide — the image sibling of the
    * text content fingerprint. */
  def imageAHashOf(payload: Array[Byte]): Option[String] =
    decodeImage(payload).map { img =>
      val w = img.getWidth; val h = img.getHeight
      val lums = new Array[Long](64)
      var j = 0
      while (j < 8) {
        val y = (j * (h - 1)) / 7
        var i = 0
        while (i < 8) {
          val x = (i * (w - 1)) / 7
          val rgb = img.getRGB(x, y)
          lums(j * 8 + i) = ((rgb >> 16) & 0xff) * 299L +
            ((rgb >> 8) & 0xff) * 587L + (rgb & 0xff) * 114L
          i += 1
        }
        j += 1
      }
      val total = lums.sum
      val sb = new StringBuilder(16)
      var k = 0
      while (k < 16) {
        var nib = 0
        var b = 0
        while (b < 4) {
          val idx = k * 4 + b
          if (lums(idx) * 64L > total) nib |= 1 << (3 - b)
          b += 1
        }
        sb.append(java.lang.Integer.toHexString(nib))
        k += 1
      }
      sb.toString
    }

  /** Deterministic real animated GIF: frame f's pixel (x, y) = gray level
    * `floorMod(seed·31 + x·7 + y·13 + f·101, 256)`, written through the JDK
    * GIF sequence writer. Frames are TYPE_BYTE_INDEXED over an identity
    * gray ramp palette (entry i = RGB(i,i,i)): GIF stores ≤256-color
    * palettes verbatim, so the round-trip is BIT-EXACT — the decode side
    * recovers the precise gray values and an oracle can hash-check
    * per-frame luminance sums against this formula. (An RGB pattern would
    * be quantized by the encoder and unverifiable.) */
  def encodeGif(width: Int, height: Int, nFrames: Int, seed: Long): Array[Byte] = {
    val ramp = Array.tabulate(256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        val raster = img.getRaster
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            raster.setSample(x, y, 0,
              java.lang.Math.floorMod(seed * 31 + x * 7 + y * 13 + f * 101,
                256).toInt)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Real audio decode via the JDK's `javax.sound.sampled`: parses WAV/AIFF
    * containers and returns the format plus the raw interleaved 16-bit PCM
    * samples. None ⇒ not a decodable 16-bit PCM stream (wrong container,
    * corrupt, or a compressed encoding the JDK doesn't ship a codec for). */
  private[ops] def decodeAudio(payload: Array[Byte])
  : Option[(javax.sound.sampled.AudioFormat, Array[Short])] =
    // canonical WAV/PCM16 rides the lock-free direct parser; everything
    // else (AIFF, AU, float WAV...) falls through to the JDK registry
    decodeWavPcm16(payload).orElse(decodeAudioViaRegistry(payload))

  /** Direct RIFF/WAVE parser for the canonical 16-bit PCM case. The JDK
    * path (`AudioSystem.getAudioInputStream`) walks a SYNCHRONIZED
    * provider registry per call — measured 3–4× per-record slowdown once
    * 8+ executor threads decode concurrently (the sf0.1→sf1 scale run
    * flagged q_audio_dedup at 37×; ImageIO, which keeps per-call reader
    * instances, scaled linearly). Pure local code, no shared state. */
  private[ops] def decodeWavPcm16(payload: Array[Byte])
  : Option[(javax.sound.sampled.AudioFormat, Array[Short])] =
    try {
      if (payload.length < 44) return None
      val b = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourcc(): String = {
        val a = new Array[Byte](4); b.get(a); new String(a, "US-ASCII")
      }
      if (fourcc() != "RIFF") return None
      b.getInt // riff size
      if (fourcc() != "WAVE") return None
      var fmtOk = false
      var rate = 0; var channels = 0
      while (b.remaining() >= 8) {
        val id = fourcc()
        val size = b.getInt
        val body = b.position()
        if (size < 0 || body + size > payload.length) return None
        id match {
          case "fmt " if size >= 16 =>
            val audioFormat = b.getShort() & 0xffff // 1 = PCM
            channels = b.getShort() & 0xffff
            rate = b.getInt
            b.getInt; b.getShort() // byte rate, block align
            val bits = b.getShort() & 0xffff
            if (audioFormat != 1 || bits != 16 || rate <= 0 ||
              channels <= 0) return None // not canonical PCM16 → registry
            fmtOk = true
          case "data" if fmtOk =>
            val n = size / 2
            val samples = new Array[Short](n)
            var i = 0
            while (i < n) { samples(i) = b.getShort(body + 2 * i); i += 1 }
            val fmt = new javax.sound.sampled.AudioFormat(
              rate.toFloat, 16, channels, true, false)
            return Some((fmt, samples))
          case _ => ()
        }
        b.position(body + size + (size % 2))
      }
      None
    } catch { case _: Exception => None }

  private[ops] def decodeAudioViaRegistry(payload: Array[Byte])
  : Option[(javax.sound.sampled.AudioFormat, Array[Short])] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        if (fmt.getEncoding !=
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16 ||
            fmt.getSampleRate <= 0 || fmt.getChannels <= 0) None // corrupt
              // header (rate 0 / NOT_SPECIFIED) must fall back, not divide
              // by zero downstream
        else {
          val bytes = in.readAllBytes()
          val n = bytes.length / 2
          val bb = java.nio.ByteBuffer.wrap(bytes).order(
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN)
          val samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = bb.getShort(); i += 1 }
          Some((fmt, samples))
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** 8-dim audio embedding: mean normalized amplitude of 8 equal PCM
    * segments — the audio twin of [[stripEmbedding]], computed from the
    * REAL decoded samples. */
  private[ops] def pcmEmbedding(samples: Array[Short]): Array[Float] = {
    val n = samples.length
    val sums = new Array[Double](8); val counts = new Array[Long](8)
    var i = 0
    while (i < n) {
      val s = (i.toLong * 8 / n).toInt // i*8 would wrap Int past ~268M samples
      sums(s) += samples(i); counts(s) += 1
      i += 1
    }
    Array.tabulate(8)(i =>
      if (counts(i) == 0) 0f else (sums(i) / counts(i) / 32768.0).toFloat)
  }

  /** Feature extraction for one record: real ImageIO decode for images,
    * real `javax.sound.sampled` decode for audio, real per-frame decode for
    * video payloads in a frame-decodable container (animated GIF);
    * [[stubDecode]] remains only for true video containers and undecodable
    * payloads. */
  private[ops] def decode(r: MediaRecord): MediaFeatures = r.media_type match {
    case "video" =>
      decodeFrames(r.payload)
        .orElse(AviMjpeg.decode(r.payload).map(_._2.toIndexedSeq)) match {
        case Some(frames) =>
          val head = frames.head
          MediaFeatures(r.media_id, r.media_type, r.payload.length.toLong,
            head.getWidth, head.getHeight, n_frames = frames.size,
            stripEmbedding(head))
        case None => stubDecode(r)
      }
    case "image" =>
      decodeImage(r.payload) match {
        case Some(img) =>
          MediaFeatures(r.media_id, r.media_type, r.payload.length.toLong,
            img.getWidth, img.getHeight, n_frames = 1, stripEmbedding(img))
        case None => stubDecode(r)
      }
    case "audio" =>
      decodeAudio(r.payload) match {
        case Some((fmt, samples)) =>
          val rate = fmt.getSampleRate.toInt
          val ch = fmt.getChannels
          val frames = samples.length / math.max(ch, 1)
          var sum = 0L
          var i = 0
          while (i < samples.length) { sum += samples(i); i += 1 }
          MediaFeatures(r.media_id, r.media_type, r.payload.length.toLong,
            width = 0, height = 0, n_frames = frames,
            embedding = pcmEmbedding(samples),
            sample_rate = rate, channels = ch,
            duration_ms = frames * 1000L / rate, pcm_sum = sum)
        case None => stubDecode(r)
      }
    case _ => stubDecode(r)
  }

  /** Deterministic real WAV: mono 16-bit little-endian PCM where sample i =
    * `(seed*31 + i*7919) % 4096 - 2048`, written through the JDK WAV
    * encoder. The decode side recovers the exact format and samples, so an
    * oracle can hash-check decoded metadata AND the PCM sum against this
    * formula — a broken codec path cannot pass. */
  def encodeWav(nSamples: Int, sampleRate: Int, seed: Long): Array[Byte] = {
    // direct RIFF/WAVE emit — byte-identical to the JDK writer's canonical
    // 44-byte-header mono PCM16 output (spec'd), minus its synchronized
    // per-call provider lookup (see [[decodeWavPcm16]])
    val dataLen = nSamples * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      b.putShort(((seed * 31 + i.toLong * 7919) % 4096 - 2048).toShort)
      i += 1
    }
    b.array()
  }

  /** Gain-invariant audio fingerprint (the energy-delta-sign family used
    * by Shazam-style matchers, reduced to its integer-exact core): split
    * the decoded PCM stream into 32 equal frames, take each frame's exact
    * integer energy Σs², and set bit f iff frame f's energy STRICTLY
    * exceeds its successor's (cyclic) — volume scaling multiplies every
    * energy by g², so the comparison pattern, and therefore the
    * fingerprint, is untouched where a byte hash would change completely.
    * Packed MSB-first into 8 lowercase hex chars. None ⇒ not decodable
    * audio, or fewer than 32 samples (no stable frame structure). */
  def audioFingerprintOf(payload: Array[Byte]): Option[String] =
    decodeAudio(payload).flatMap { case (_, samples) =>
      val n = samples.length
      if (n < 32) None
      else {
        val fl = n / 32
        val e = Array.tabulate(32) { f =>
          var s = 0L
          var i = f * fl
          while (i < (f + 1) * fl) {
            val v = samples(i).toLong; s += v * v; i += 1
          }
          s
        }
        val sb = new StringBuilder(8)
        var k = 0
        while (k < 8) {
          var nib = 0
          var b = 0
          while (b < 4) {
            val f = k * 4 + b
            if (e(f) > e((f + 1) % 32)) nib |= 1 << (3 - b)
            b += 1
          }
          sb.append(java.lang.Integer.toHexString(nib))
          k += 1
        }
        Some(sb.toString)
      }
    }

  /** STUB decode: deterministic fake features derived from payload bytes —
    * the fallback for BITSTREAM-coded video (mp4/H.264, webm/VP9: no JDK
    * entropy codec; GIF and MJPEG/AVI decode for real above) and the
    * safety net for undecodable image/audio payloads. */
  private[ops] def stubDecode(r: MediaRecord): MediaFeatures = {
    val n = r.payload.length
    val checksum = r.payload.foldLeft(17L)((a, b) => a * 31 + (b & 0xff))
    MediaFeatures(
      r.media_id, r.media_type, n.toLong,
      width = (checksum % 640).toInt.abs + 1,
      height = (checksum % 480).toInt.abs + 1,
      n_frames = if (r.media_type == "video") (n / 1000) + 1 else 1,
      embedding = Array.tabulate(8)(i =>
        (((checksum >> (i * 8)) & 0xff).toFloat / 255f) - 0.5f))
  }

  /** Decode/feature-extract in partition-local batches — the mapInPandas-style
    * batch shape: the iterator is chunked so a real codec amortizes per-batch
    * setup (model load, GPU transfer) across `batchSize` records. */
  def extractFeatures(ds: Dataset[MediaRecord], batchSize: Int = 64)
  : Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup would go here (model init, GPU transfer)
        batch.map(decode)
      }
    }
  }

  /** Wrap any DataFrame with a binary column into the media schema. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
              mediaType: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      lit(mediaType).as("media_type"),
      col(payloadCol).cast(BinaryType).as("payload"),
      map(lit("origin"), lit("graft")).as("meta"))

  /** Partition by size class so huge blobs don't skew tasks — at 100 TB the
    * payload distribution is heavy-tailed and a size-aware repartition keeps
    * task runtimes even. */
  def sizeBalanced(df: DataFrame, partitions: Int): DataFrame =
    df.repartitionByRange(partitions,
      octet_length(col("payload")), col("media_id"))

  /** One sampled frame. `lum_milli_sum` is the exact integer pixel witness
    * ([[luminanceMilliSum]]) for really-decoded frames — 0 on the stub
    * path, where there are no real pixels to witness. */
  case class Frame(media_id: Long, frame_idx: Int, t_ms: Long,
                   embedding: Array[Float], lum_milli_sum: Long = 0L)

  /** Frame sampling: one row per sampled frame at `everyMs` spacing — the
    * 1→N explode shape a video pipeline needs. A frame-decodable container
    * (animated GIF, [[decodeFrames]]) yields REAL frames: the sample at
    * time t is the decoded frame t/frameMs, embedded from its true pixels
    * with its exact luminance witness. Payloads the JDK cannot
    * frame-decode (true video containers) keep the stub path: frame count
    * from [[stubDecode]], the media embedding perturbed per-frame. The
    * per-batch iterator shape is identical to [[extractFeatures]]. */
  def sampleFrames(ds: Dataset[MediaRecord], everyMs: Long,
                   frameMs: Long = 40L): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { r =>
        // GIF frames tick at the caller's frameMs; an MJPEG/AVI carries its
        // OWN frame clock (avih µs-per-frame), which overrides it
        decodeFrames(r.payload).map(fs => (frameMs, fs))
          .orElse(AviMjpeg.decode(r.payload).map { case (us, fs) =>
            (math.max(us / 1000L, 1L), fs.toIndexedSeq)
          }) match {
          case Some((fMs, frames)) =>
            val durationMs = frames.size * fMs
            (0L until durationMs by everyMs).zipWithIndex.map { case (t, i) =>
              val img = frames(math.min((t / fMs).toInt, frames.size - 1))
              Frame(r.media_id, i, t, stripEmbedding(img),
                luminanceMilliSum(img))
            }
          case None =>
            val f = decode(r)
            val durationMs = f.n_frames * frameMs
            (0L until durationMs by everyMs).zipWithIndex.map { case (t, i) =>
              // STUB frame embedding: the media embedding perturbed
              // per-frame; a real codec would seek to t and embed the frame
              Frame(r.media_id, i, t,
                f.embedding.zipWithIndex.map { case (v, j) =>
                  v + (((t + j) % 7).toFloat / 100f)
                })
            }
        }
      }
    }
  }

  /** Resize: metadata-level transform (target dims recorded; payload passes
    * through untouched by the STUB — a real impl re-encodes here). Keeping
    * resize as a separate projection means the expensive re-encode composes
    * with [[sizeBalanced]] and batching exactly like decode does. */
  def resizeTo(ds: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.map(r => r.copy(meta =
      Option(r.meta).getOrElse(Map.empty) ++
        Map("resize_w" -> w.toString, "resize_h" -> h.toString)))
  }
}
