package graft.streaming

import java.io.File

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
  * micro-batch's deferred rows into the PARKING-LOT topic at `root` — one
  * envelope partition per bucket ([[StatefulOps.delayedBucketDir]]), so
  * parking any number of buckets is ONE routed graft-topic write (the
  * producer partition-router doing the fan-out inside the job), not a
  * driver-paced per-bucket job loop. A periodic [[reingestDue]]
  * (cron-triggered batch job) moves every bucket whose window enters the
  * live horizon back into the ingest topic, where the stream re-buffers
  * them as near-term. Delivery state stays bounded by arrival-rate ×
  * horizon while the parked backlog lives on storage, not in stream state.
  *
  * Re-ingestion is AT-LEAST-ONCE: a crash between the target write and the
  * bucket retire re-ingests the bucket on the next run — the same
  * redelivery contract as every segment-level operation here, and the
  * envelope keeps (key, sequence_id) for the standard downstream dedup. */
object DelayedBuckets {

  /** Park one batch of routes: "defer" rows land in their bucket's
    * partition of the parking-lot topic at `root` (deliverAt rides the
    * envelope's event_time, the original offset its sequence_id, the
    * bucket id the partition — the router fans out inside the ONE write
    * job); "deliver" rows are untouched. Returns the parked bucket ids;
    * the distinct-bucket aggregation is the only other job, so parking B
    * buckets is O(1) jobs however large B grows. */
  def park(routes: Dataset[DelayedRoute], root: String): Seq[Long] = {
    val defer = routes.filter(_.disposition == "defer").persist()
    try {
      import routes.sparkSession.implicits._
      val buckets = defer.map(_.bucket).distinct().collect().sorted
      buckets.foreach(StatefulOps.delayedBucketDir) // int-range guard
      if (buckets.nonEmpty)
        defer.select(col("key"), col("value"),
            col("offset").as("sequence_id"),
            col("deliverAt").as("event_time"),
            col("bucket").cast("int").as("partition"))
          .write.format("graft-topic").mode("append")
          .option("path", root).save()
      buckets.toIndexedSeq
    } finally defer.unpersist()
  }

  /** Run tokens of in-flight [[reingestDue]] calls in THIS JVM: the
    * recovery sweep must not drain an aside dir a concurrent run (a cron
    * fire overlapping a manual run — same driver process, the deployment
    * contract) renamed and is actively draining; only orphans whose owner
    * is no longer live are crash debris. Cross-PROCESS overlap stays
    * unsupported, like every single-driver component here. */
  private val liveRuns =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private[streaming] def registerRun(token: String): Unit = liveRuns.add(token)
  private[streaming] def unregisterRun(token: String): Unit =
    liveRuns.remove(token)

  /** Token embedded in an aside-dir name: `.retiring-<token>-<bucket dir>`.
    * Dash-free so it parses back unambiguously. */
  private def asideToken(name: String): String =
    name.stripPrefix(".retiring-").takeWhile(_ != '-')

  /** Re-ingest every parked bucket whose window END is within `horizonMs`
    * of `nowMs` — then EVERY row in the bucket satisfies the tracker's own
    * near/far predicate against wall clock, so nothing ping-pongs back into
    * the same bucket (modulo watermark lag, which is bounded and
    * self-resolving). Pick `horizonMs` ≥ 2 × `bucketMs` so a bucket's
    * earliest rows re-enter comfortably before their deliverAt. Each due
    * bucket is first RENAMED aside and read from there: a park landing in
    * the live directory between this job's read and its cleanup would
    * otherwise be deleted unread — renamed-aside, a concurrent park simply
    * recreates the live directory and its rows wait for the next fire,
    * while a park caught mid-stage fails its job and replays (the
    * at-least-once contract, loss-free). Rows append to `targetTopic`
    * (deliverAt restored from event_time via the envelope); returns
    * re-ingested bucket ids, and a second run is a no-op. */
  def reingestDue(spark: SparkSession, root: String, targetTopic: String,
                  nowMs: Long, bucketMs: Long, horizonMs: Long): Seq[Long] = {
    val runToken = java.util.UUID.randomUUID().toString.replace("-", "")
    registerRun(runToken)
    try {
      def drain(dir: File): Unit = {
        spark.read.format("graft-topic").option("path", dir.getAbsolutePath)
          .load()
          .select(col("key"), col("value"), col("sequence_id"),
            col("event_time"))
          .write.format("graft-topic").mode("append")
          .option("path", targetTopic).save()
        graft.ops.Fs.deleteRecursively(dir)
      }
      def listed() = Option(new File(root).listFiles()).getOrElse(Array.empty)
      // recover first: a crash between a previous run's target write and its
      // cleanup leaves a .retiring dir — it was due then, so drain it now
      // (rows already written before the crash re-ingest again: the
      // at-least-once side of the contract). Aside dirs OWNED by a live
      // concurrent run are being drained by that run, not orphans: draining
      // them here would double-ingest the bucket and race the owner's
      // cleanup.
      listed().filter(f => f.isDirectory && f.getName.startsWith(".retiring-"))
        .filterNot(f => liveRuns.contains(asideToken(f.getName)))
        .foreach(drain)
      val BucketDir = "partition-(\\d+)".r
      val due = listed()
        .flatMap(f => f.getName match {
          case BucketDir(b) if f.isDirectory => Some((b.toLong, f))
          case _ => None
        })
        .filter { case (b, _) => (b + 1) * bucketMs <= nowMs + horizonMs }
        .sortBy(_._1)
      val ingested = due.flatMap { case (b, dir) =>
        val aside = new File(root, s".retiring-$runToken-${dir.getName}")
        if (!dir.renameTo(aside)) None // lost a race with another run: skip
        else { drain(aside); Some(b) }
      }
      ingested.toIndexedSeq
    } finally unregisterRun(runToken)
  }

}
