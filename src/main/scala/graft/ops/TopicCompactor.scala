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
  *  - phase two: write the compacted horizon as new sealed segments — one per
  *    (partition, offset-range), each sorted by offset, written in parallel —
  *    then swap out the segments they replace. Readers before the swap see
  *    the old segments, after it the compacted ones — the compacted-ledger
  *    switch of CompactedTopicImpl, distributed: at 100 TB the horizon is
  *    |keys| rows and must never serialize through one task.
  *
  * Offsets are preserved, so consumers keep their cursor semantics
  * (a compacted read returns each key's latest offset, exactly like reading
  * through the compacted ledger).
  *
  * Live tails: the streaming cursor tracks segment NAMES, so a tail re-
  * receives the compacted horizon under its new names (same offsets).
  * Guard downstream with `dropDuplicates("partition", "offset")` — offset
  * stability across compaction exists precisely to make that dedup exact
  * (spec: "tailing across compaction").
  */
object TopicCompactor {

  /** Compact `dir` in place. Returns (keysKept, segmentsRemoved).
    * `targetSegments` caps the output range count (0 = the session's shuffle
    * parallelism); range partitioning on (partition, offset) keeps each
    * output segment offset-sorted and segment-name order aligned with offset
    * order, so min/max pruning stays effective over the compacted horizon. */
  def compact(spark: SparkSession, dir: String, targetSegments: Int = 0): (Long, Int) = {
    val before = TopicTable.listSegments(dir)
    if (before.isEmpty) return (0L, 0)
    val df = spark.read.format("graft-topic").option("path", dir).load()

    val latest = Compaction
      .compact(df, Seq("key"), col("offset"))
      .where(col("value").isNotNull) // tombstone removal
    val compacted = (if (targetSegments > 0)
      latest.repartitionByRange(targetSegments, col("partition"), col("offset"))
    else latest.repartitionByRange(col("partition"), col("offset")))
      .sortWithinPartitions(col("partition"), col("offset"))

    // phase two: new sealed segments first, then drop the replaced ones —
    // crash between the two steps leaves duplicates (re-compactable), never
    // data loss.
    compacted.write.format("graft-topic")
      .option("path", dir).mode("append").save()
    before.foreach { f =>
      f.delete()
      graft.sources.v2.SegmentStats.sidecarFor(f).delete()
    }

    val kept = spark.read.format("graft-topic").option("path", dir).load().count()
    (kept, before.length)
  }

  /** TTL / retention enforcement: drop whole segments whose newest message is
    * older than the horizon — the cursor fast-forward of
    * PersistentMessageExpiryMonitor (reference: broker/.../
    * PersistentMessageExpiryMonitor.java:44-104) plus size/time retention
    * (RetentionPolicies.java:30-38), at sealed-segment granularity so expiry
    * is a metadata operation, never a rewrite. Straddling segments stay (the
    * reader's TTL filter handles residue rows). Returns segments removed. */
  def expire(spark: SparkSession, dir: String, olderThanMs: Long): Int = {
    // provably-old only: a segment of unknown age (null publish times) is
    // NOT expired — TTL must never destroy data it cannot date
    val expired = TopicTable.listSegments(dir).filter(f =>
      graft.sources.v2.SegmentStats.whollyOlderThan(f, olderThanMs))
    expired.foreach { f =>
      f.delete()
      graft.sources.v2.SegmentStats.sidecarFor(f).delete()
    }
    expired.length
  }
}
