package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus the batch-iterator decode/feature-extract shape.
  *
  * The Spark-side plumbing — schema, partitioning, batched iteration, feature
  * schema — is real; the codec itself is a clearly-marked STUB (no media
  * libraries in this environment): `stubDecode` produces deterministic fake
  * features from the payload bytes so the pipeline is testable end-to-end.
  * Swapping in a real decoder = replacing one function, nothing else moves.
  */
object Multimodal {

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

  /** STUB decode: deterministic fake features derived from payload bytes.
    * A real implementation would decode the image/audio container here. */
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
        // per-batch setup would go here (codec/model init)
        batch.map(stubDecode)
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
        val f = stubDecode(r)
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
