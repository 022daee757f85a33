package graft.streaming

import java.io.File

import graft.streaming.StatefulOps.delayedBucketTopic
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Bucket-topic orchestration for [[StatefulOps.delayedDeliveryBounded]] —
  * the missing half of the reference's bucketed delayed-delivery tracker
  * (broker/.../delayed/bucket/BucketDelayedDeliveryTracker.java: far-future
  * deliveries are snapshotted out of memory into buckets and re-loaded when
  * their time nears).
  *
  * `delayedDeliveryBounded` emits far-future messages as disposition
  * "defer" with a `deliverAt / bucketMs` bucket id; [[park]] writes each
  * micro-batch's deferred rows into per-bucket graft-topics
  * (`delayed-bucket-<n>`), and a periodic [[reingestDue]] (cron-triggered
  * batch job) moves every bucket whose window enters the live horizon back
  * into the ingest topic, where the stream re-buffers them as near-term.
  * Delivery state stays bounded by arrival-rate × horizon while the parked
  * backlog lives on storage, not in stream state.
  *
  * Re-ingestion is AT-LEAST-ONCE: a crash between the target write and the
  * bucket retire re-ingests the bucket on the next run — the same
  * redelivery contract as every segment-level operation here, and the
  * envelope keeps (key, sequence_id) for the standard downstream dedup. */
object DelayedBuckets {

  /** Park one batch of routes: "defer" rows land in their bucket topic
    * under `root` (deliverAt rides the envelope's event_time, the original
    * offset its sequence_id); "deliver" rows are untouched. Returns the
    * parked bucket ids. The distinct-bucket set is bounded by the batch's
    * deliver-at spread / bucketMs, so the driver-side loop stays small. */
  def park(routes: Dataset[DelayedRoute], root: String): Seq[Long] = {
    val defer = routes.filter(_.disposition == "defer").persist()
    try {
      import routes.sparkSession.implicits._
      val buckets = defer.map(_.bucket).distinct().collect().sorted
      buckets.foreach { b =>
        defer.filter(_.bucket == b)
          .select(col("key"), col("value"),
            col("offset").as("sequence_id"),
            col("deliverAt").as("event_time"))
          .write.format("graft-topic").mode("append")
          .option("path", s"$root/${delayedBucketTopic(b)}").save()
      }
      buckets.toIndexedSeq
    } finally defer.unpersist()
  }

  /** Re-ingest every parked bucket whose window START is within
    * `horizonMs` of `nowMs` — due messages must re-enter the live tracker
    * BEFORE their deliverAt arrives, and anything the bounded tracker can
    * buffer (≤ horizon ahead) is safe to hand back. Each due bucket's rows
    * are appended to `targetTopic` (deliverAt restored from event_time via
    * the envelope), then the bucket is retired. Returns re-ingested bucket
    * ids; a second run is a no-op. */
  def reingestDue(spark: SparkSession, root: String, targetTopic: String,
                  nowMs: Long, bucketMs: Long, horizonMs: Long): Seq[Long] = {
    val due = Option(new File(root).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("delayed-bucket-"))
      .map(f => (f.getName.stripPrefix("delayed-bucket-").toLong, f))
      .filter { case (b, _) => b * bucketMs <= nowMs + horizonMs }
      .sortBy(_._1)
    due.foreach { case (_, dir) =>
      spark.read.format("graft-topic").option("path", dir.getAbsolutePath)
        .load()
        .select(col("key"), col("value"), col("sequence_id"),
          col("event_time"))
        .write.format("graft-topic").mode("append")
        .option("path", targetTopic).save()
      deleteRecursively(dir)
    }
    due.map(_._1).toIndexedSeq
  }

  private def deleteRecursively(f: File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }
}
