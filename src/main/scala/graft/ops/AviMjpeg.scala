package graft.ops

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM MJPEG/AVI video codec — a REAL video container the engine can
  * decode without any native codec: AVI is a RIFF chunk tree and MJPEG
  * stores each frame as an ordinary JPEG, which the JDK's ImageIO decodes.
  * This closes the video-decode honesty gap for container formats whose
  * frames the JDK can picture-decode; mp4/webm (H.264/VP9 bitstreams)
  * genuinely need a codec the JDK does not ship and remain out of scope
  * (documented in README and [[Multimodal]]).
  *
  * Writer emits the minimal spec shape (hdrl with avih + one vids strl,
  * movi with 00dc chunks, even-byte padding); reader walks the chunk tree
  * tolerantly — it needs only a well-formed RIFF/AVI header, a readable
  * `avih` microseconds-per-frame, and `00dc`/`00db` frame chunks that
  * ImageIO accepts, so third-party MJPEG AVIs decode too.
  *
  * Reference analog: the chunked-message reassembly path — a framed binary
  * container split into self-describing chunks the client re-walks
  * (pulsar-client/.../impl/ChunkedMessageCtx.java).
  */
object AviMjpeg {

  private val FPS_SCALE = 1000000L // avih dwMicroSecPerFrame units

  /** Encode frames as an MJPEG AVI at `fps` (JPEG per frame through the
    * JDK encoder). Deterministic for fixed inputs and JVM. */
  def encode(frames: Seq[BufferedImage], fps: Int): Array[Byte] = {
    require(frames.nonEmpty, "no frames")
    require(fps >= 1 && fps <= 1000, s"bad fps $fps")
    val w = frames.head.getWidth
    val h = frames.head.getHeight
    require(frames.forall(f => f.getWidth == w && f.getHeight == h),
      "frames must share dimensions")
    val jpegs = frames.map { f =>
      val bos = new ByteArrayOutputStream()
      // JPEG writer rejects alpha: repaint onto an opaque RGB canvas
      val rgb = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = rgb.createGraphics()
      try g.drawImage(f, 0, 0, null) finally g.dispose()
      require(javax.imageio.ImageIO.write(rgb, "jpg", bos), "no JPEG writer")
      bos.toByteArray
    }
    val maxFrame = jpegs.map(_.length).max

    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length % 2 // RIFF chunks are even-aligned
      val b = ByteBuffer.allocate(8 + body.length + pad)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      if (pad == 1) b.put(0.toByte)
      b.array()
    }
    def list(kind: String, bodies: Array[Byte]*): Array[Byte] = {
      val inner = bodies.foldLeft(Array.empty[Byte])(_ ++ _)
      val b = ByteBuffer.allocate(12 + inner.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put("LIST".getBytes("US-ASCII")).putInt(4 + inner.length)
        .put(kind.getBytes("US-ASCII")).put(inner)
      b.array()
    }
    def le(ints: Int*): Array[Byte] = {
      val b = ByteBuffer.allocate(4 * ints.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      ints.foreach(b.putInt); b.array()
    }

    val usPerFrame = (FPS_SCALE / fps).toInt
    val avih = chunk("avih", le(
      usPerFrame, maxFrame * fps, 0, 0x10 /* AVIF_HASINDEX off, plain */,
      frames.size, 0, 1 /* streams */, maxFrame, w, h, 0, 0, 0, 0))
    val strh = chunk("strh",
      "vids".getBytes("US-ASCII") ++ "MJPG".getBytes("US-ASCII") ++
        le(0, 0, 0, 1 /* scale */, fps /* rate */, 0, frames.size,
          maxFrame, -1 /* quality */, 0) ++
        le(0, 0) /* rcFrame as 4 shorts */)
    val strf = chunk("strf", le(40, w, h, 1 | (24 << 16)) ++
      "MJPG".getBytes("US-ASCII") ++ le(w * h * 3, 0, 0, 0, 0))
    val hdrl = list("hdrl", avih, list("strl", strh, strf))
    val movi = list("movi", jpegs.map(j => chunk("00dc", j)): _*)

    val payload = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val out = ByteBuffer.allocate(8 + payload.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(payload.length).put(payload)
    out.array()
  }

  /** Decode an AVI payload: (microseconds per frame, frames) — None if the
    * payload is not RIFF/AVI or no frame chunk picture-decodes. */
  def decode(payload: Array[Byte])
  : Option[(Long, Seq[BufferedImage])] = {
    if (payload.length < 12) return None
    val b = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val a = new Array[Byte](4); b.get(a); new String(a, "US-ASCII")
    }
    if (fourcc() != "RIFF") return None
    b.getInt // riff size
    if (fourcc() != "AVI ") return None

    var usPerFrame = 0L
    val frames = Seq.newBuilder[BufferedImage]
    // walk chunks; recurse into LISTs by simply continuing inside them
    def walk(end: Int): Unit = {
      while (b.position() + 8 <= end) {
        val id = fourcc()
        val size = b.getInt
        val body = b.position()
        if (size < 0 || body + size > end) return // truncated — stop
        id match {
          case "LIST" =>
            b.position(body + 4) // skip list kind, descend
            walk(body + size)
          case "avih" if size >= 4 =>
            usPerFrame = b.getInt.toLong & 0xffffffffL
          case "00dc" | "00db" =>
            try Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(payload, body, size)))
              .foreach(frames += _)
            catch { case _: Exception => () }
          case _ => ()
        }
        b.position(body + size + (size % 2)) // even alignment
      }
    }
    try walk(payload.length) catch { case _: Exception => () }
    val fs = frames.result()
    if (fs.isEmpty) None
    else Some((if (usPerFrame > 0) usPerFrame else 40000L, fs))
  }
}
