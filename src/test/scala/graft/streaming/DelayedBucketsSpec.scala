package graft.streaming

import java.io.File
import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Bucket-topic orchestration around delayedDeliveryBounded: defer routes
  * park into per-bucket topics, due buckets re-ingest exactly once, and the
  * envelope round-trips (key, sequence_id, deliverAt). */
class DelayedBucketsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)
  private val BucketMs = 60000L

  test("park routes defers per bucket; due buckets re-ingest once and retire") {
    val root = Files.createTempDirectory("delayed-buckets").toFile.getAbsolutePath
    val target = s"$root/__ingest"
    val routes = Seq(
      DelayedRoute("k1", "v1", 1L, ts(100000L), "defer", 100000L / BucketMs),
      DelayedRoute("k2", "v2", 2L, ts(130000L), "defer", 130000L / BucketMs),
      DelayedRoute("k3", "v3", 3L, ts(500000L), "defer", 500000L / BucketMs),
      DelayedRoute("k4", "v4", 4L, ts(1000L), "deliver", -1L)).toDS()
    val parked = DelayedBuckets.park(routes, root)
    assert(parked == Seq(1L, 2L, 8L))
    // each bucket topic holds exactly its rows; "deliver" rows never park
    val b1 = spark.read.format("graft-topic")
      .option("path", s"$root/${StatefulOps.delayedBucketDir(1L)}").load()
    assert(b1.select("key").as[String].collect().toSeq == Seq("k1"))
    // EXACTLY the three defer buckets exist — in particular no bucket for
    // the "deliver" row (its bucket id is -1)
    assert(new File(root).listFiles().map(_.getName).toSet ==
      Set(1L, 2L, 8L).map(StatefulOps.delayedBucketDir))

    // now = 65s, horizon 60s: only bucket 1 (window ENDS 120s ≤ 125s) is
    // due — window-END due-ness means every handed-back row is within the
    // tracker's own near horizon; buckets 2 (ends 180s) and 8 stay parked
    assert(DelayedBuckets.reingestDue(spark, root, target,
      nowMs = 65000L, bucketMs = BucketMs, horizonMs = 60000L) == Seq(1L))
    val got1 = spark.read.format("graft-topic").option("path", target).load()
      .select(col("key"), col("value"), col("sequence_id"),
        unix_millis(col("event_time")).as("deliver_ms"))
      .as[(String, String, Long, Long)].collect().toSet
    assert(got1 == Set(("k1", "v1", 1L, 100000L)),
      "envelope must round-trip key/sequence_id/deliverAt")
    // the due bucket is retired; a second run is a no-op
    assert(!new File(s"$root/${StatefulOps.delayedBucketDir(1L)}").exists())
    assert(DelayedBuckets.reingestDue(spark, root, target,
      nowMs = 65000L, bucketMs = BucketMs, horizonMs = 60000L).isEmpty)

    // time advances: the remaining buckets re-ingest together
    assert(DelayedBuckets.reingestDue(spark, root, target,
      nowMs = 480000L, bucketMs = BucketMs, horizonMs = 60000L) == Seq(2L, 8L))
    val keys = spark.read.format("graft-topic").option("path", target).load()
      .select("key").as[String].collect().toSet
    assert(keys == Set("k1", "k2", "k3"))
  }

  test("a crash between re-ingest write and cleanup is recovered, not lost") {
    val root = Files.createTempDirectory("delayed-crash").toFile.getAbsolutePath
    val target = s"$root/__ingest"
    DelayedBuckets.park(Seq(
      DelayedRoute("kc", "vc", 5L, ts(70000L), "defer", 70000L / BucketMs))
      .toDS(), root)
    // simulate the crash window: the bucket was renamed aside (this run's
    // first step) but the process died before draining it
    val live = new File(s"$root/${StatefulOps.delayedBucketDir(1L)}")
    assert(live.renameTo(new File(root, ".retiring-crashed-run")))
    // ANY later run sweeps the orphan first, even if nothing else is due
    assert(DelayedBuckets.reingestDue(spark, root, target,
      nowMs = 0L, bucketMs = BucketMs, horizonMs = 0L).isEmpty)
    assert(spark.read.format("graft-topic").option("path", target).load()
      .select("key").as[String].collect().toSeq == Seq("kc"))
    assert(!new File(root, ".retiring-crashed-run").exists())
  }

  test("the recovery sweep skips aside dirs owned by a live concurrent run") {
    val root = Files.createTempDirectory("delayed-race").toFile.getAbsolutePath
    val target = s"$root/__ingest"
    DelayedBuckets.park(Seq(
      DelayedRoute("kz", "vz", 6L, ts(70000L), "defer", 70000L / BucketMs))
      .toDS(), root)
    // another run in this JVM renamed the bucket aside and is draining it
    val live = new File(s"$root/${StatefulOps.delayedBucketDir(1L)}")
    val token = "feedfacecafe"
    val aside = new File(root, s".retiring-$token-${live.getName}")
    assert(live.renameTo(aside))
    DelayedBuckets.registerRun(token)
    try {
      assert(DelayedBuckets.reingestDue(spark, root, target,
        nowMs = 0L, bucketMs = BucketMs, horizonMs = 0L).isEmpty)
      assert(aside.exists(),
        "an aside dir owned by a live run must not be swept (double-ingest)")
    } finally DelayedBuckets.unregisterRun(token)
    // the owner is gone: now it is crash debris and sweeps normally
    DelayedBuckets.reingestDue(spark, root, target,
      nowMs = 0L, bucketMs = BucketMs, horizonMs = 0L)
    assert(!aside.exists())
    assert(spark.read.format("graft-topic").option("path", target).load()
      .select("key").as[String].collect().toSeq == Seq("kz"))
  }

  test("re-ingested messages flow back through the bounded tracker as near-term") {
    // the full loop, batch-shaped: a bucket re-ingests into a topic whose
    // rows become DelayedMsg input again; within the horizon the tracker
    // holds them (no defer), proving the park/re-ingest boundary matches
    // the tracker's own near/far split
    val root = Files.createTempDirectory("delayed-loop").toFile.getAbsolutePath
    val target = s"$root/__ingest"
    val routes = Seq(
      DelayedRoute("k9", "v9", 9L, ts(70000L), "defer", 70000L / BucketMs)).toDS()
    DelayedBuckets.park(routes, root)
    // bucket 1's window ends at 120s: due once now + horizon reaches it
    DelayedBuckets.reingestDue(spark, root, target,
      nowMs = 60000L, bucketMs = BucketMs, horizonMs = 60000L)
    val replayed = spark.read.format("graft-topic").option("path", target)
      .load()
      .select(col("key"), col("value"),
        col("sequence_id").as("offset"), col("event_time").as("deliverAt"))
      .as[DelayedMsg].collect()
    assert(replayed.length == 1 && replayed.head.deliverAt == ts(70000L))
    // 70s deliverAt with a watermark at 60s is within the 60s horizon: the
    // bounded tracker's near/far split would now HOLD it, not defer it —
    // the same predicate delayedDeliveryBounded applies, so nothing
    // ping-pongs back into the bucket it came from
    assert(replayed.head.deliverAt.getTime <= 60000L + 60000L)
  }
}
