package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus the batch-iterator decode/feature-extract shape.
  *
  * IMAGE decode is REAL: the JDK's `javax.imageio` reads PNG/JPEG/GIF/BMP
  * payloads (zero new dependencies), yielding true width/height and a
  * deterministic pixel-derived embedding. Audio/video stay behind the
  * clearly-marked `stubDecode` (the JDK ships no audio/video codec); a
  * payload that fails image decode also falls back there, so the pipeline
  * never throws on corrupt blobs. Swapping in a richer codec = replacing one
  * function, nothing else moves.
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
                           embedding: Array[Float])

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

  /** Feature extraction for one record: real ImageIO decode for images,
    * [[stubDecode]] fallback for everything else (incl. undecodable
    * payloads). */
  private[ops] def decode(r: MediaRecord): MediaFeatures =
    (if (r.media_type == "image") decodeImage(r.payload) else None) match {
      case Some(img) =>
        MediaFeatures(r.media_id, r.media_type, r.payload.length.toLong,
          img.getWidth, img.getHeight, n_frames = 1, stripEmbedding(img))
      case None => stubDecode(r)
    }

  /** STUB decode: deterministic fake features derived from payload bytes —
    * the audio/video fallback (no JDK codec exists for those). */
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

  case class Frame(media_id: Long, frame_idx: Int, t_ms: Long,
                   embedding: Array[Float])

  /** Frame sampling: one row per sampled frame at `everyMs` spacing — the
    * 1→N explode shape a video pipeline needs (frame count from the stub
    * decode; a real codec would seek/decode each timestamp; the per-batch
    * iterator shape is identical to [[extractFeatures]]). */
  def sampleFrames(ds: Dataset[MediaRecord], everyMs: Long,
                   frameMs: Long = 40L): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { r =>
        val f = decode(r)
        val durationMs = f.n_frames * frameMs
        (0L until durationMs by everyMs).zipWithIndex.map { case (t, i) =>
          // STUB frame embedding: the media embedding perturbed per-frame;
          // a real decoder seeks to t and embeds the decoded frame
          Frame(r.media_id, i, t,
            f.embedding.zipWithIndex.map { case (v, j) =>
              v + (((t + j) % 7).toFloat / 100f)
            })
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
