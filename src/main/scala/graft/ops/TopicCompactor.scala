package graft.ops

import java.io.File

import graft.sources.v2.TopicTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Topic compaction as a maintenance job over the graft-topic segment log —
  * the TwoPhaseCompactor end to end (reference: pulsar-broker/.../compaction/
  * TwoPhaseCompactor.java:62-152):
  *
  *  - phase one: scan the topic, reduce to latest-entry-per-key
  *    ([[Compaction.compact]] — one hash aggregation, not a sequential scan);
  *  - tombstones: keys whose surviving record has a null value are dropped
  *    (phase-two behavior);
  *  - phase two: write the compacted horizon as ONE new sealed segment, then
  *    atomically swap out the segments it replaces. Readers before the swap
  *    see the old segments, after it the compacted one — the compacted-ledger
  *    switch of CompactedTopicImpl.
  *
  * Offsets are preserved, so consumers keep their cursor semantics
  * (a compacted read returns each key's latest offset, exactly like reading
  * through the compacted ledger).
  */
object TopicCompactor {

  /** Compact `dir` in place. Returns (keysKept, segmentsRemoved). */
  def compact(spark: SparkSession, dir: String): (Long, Int) = {
    val before = TopicTable.listSegments(dir)
    if (before.isEmpty) return (0L, 0)
    val df = spark.read.format("graft-topic").option("path", dir).load()

    val compacted = Compaction
      .compact(df, Seq("key"), col("offset"))
      .where(col("value").isNotNull) // tombstone removal
      .sortWithinPartitions(col("offset"))

    // phase two: new sealed segment first, then drop the replaced ones —
    // crash between the two steps leaves duplicates (re-compactable), never
    // data loss.
    compacted.coalesce(1).write.format("graft-topic")
      .option("path", dir).mode("append").save()
    val after = TopicTable.listSegments(dir).map(_.getName).toSet
    val toRemove = before.filter(f => after.contains(f.getName))
    toRemove.foreach { f =>
      f.delete()
      graft.sources.v2.SegmentStats.sidecarFor(f).delete()
    }

    val kept = spark.read.format("graft-topic").option("path", dir).load().count()
    (kept, toRemove.length)
  }

  /** TTL / retention enforcement: drop whole segments whose newest message is
    * older than the horizon — the cursor fast-forward of
    * PersistentMessageExpiryMonitor (reference: broker/.../
    * PersistentMessageExpiryMonitor.java:44-104) plus size/time retention
    * (RetentionPolicies.java:30-38), at sealed-segment granularity so expiry
    * is a metadata operation, never a rewrite. Straddling segments stay (the
    * reader's TTL filter handles residue rows). Returns segments removed. */
  def expire(spark: SparkSession, dir: String, olderThanMs: Long): Int = {
    import org.apache.spark.sql.sources.{Filter, GreaterThanOrEqual}
    val expired = TopicTable.listSegments(dir).filter { f =>
      !graft.sources.v2.SegmentStats.mightMatch(f,
        Array(GreaterThanOrEqual("publish_time",
          new java.sql.Timestamp(olderThanMs)): Filter))
    }
    expired.foreach { f =>
      f.delete()
      graft.sources.v2.SegmentStats.sidecarFor(f).delete()
    }
    expired.length
  }
}
