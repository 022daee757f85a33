package graft.ops

import graft.sources.v2.TopicTable

/** Backlog quotas over the segment log — BacklogQuota limits + retention
  * policies (reference: pulsar-client-admin-api/.../BacklogQuota.java:81-89 —
  * limitSize/limitTime with producer_request_hold / producer_exception /
  * consumer_backlog_eviction; enforcement
  * pulsar-broker/.../BacklogQuotaManager.java).
  *
  * Everything here is METADATA-ONLY: backlog size comes from segment file
  * lengths and cursor position from the per-segment offset footer, so a quota
  * check on a 100 TB topic reads zero data rows. Eviction advances the cursor
  * past whole sealed segments (dropBacklog semantics), exactly like the
  * reference's consumer_backlog_eviction skipping entries.
  */
object BacklogQuota {

  sealed trait Policy
  /** Producers should pause until the backlog drains (the check result tells
    * the caller to hold; Spark side: pause the writeStream trigger). */
  case object ProducerHold extends Policy
  /** Producers should fail the write. */
  case object ProducerException extends Policy
  /** Oldest backlog is dropped until the quota holds. */
  case object ConsumerBacklogEviction extends Policy

  case class Status(backlogBytes: Long, backlogSegments: Int, exceeded: Boolean)

  private def backlogSegs(dir: String, cursorOffset: Long) =
    TopicTable.listPartitioned(dir).map(_._2).filter { f =>
      // a segment is backlog iff it has entries past the cursor
      import org.apache.spark.sql.sources.{Filter, GreaterThan}
      graft.sources.v2.SegmentStats.mightMatch(f,
        Array(GreaterThan("offset", cursorOffset): Filter))
    }.sortBy(f => // oldest DATA first — names interleave across families
      graft.sources.v2.SegmentStats.statsFor(f).map(_.maxOff)
        .getOrElse(Long.MaxValue))

  /** Quota check for the subscription at `cursorOffset`. */
  def check(dir: String, cursorOffset: Long, limitBytes: Long): Status = {
    val segs = backlogSegs(dir, cursorOffset)
    val bytes = segs.map(_.length()).sum
    Status(bytes, segs.length, bytes > limitBytes)
  }

  /** Enforce the quota under the given policy. For
    * [[ConsumerBacklogEviction]] the OLDEST backlog segments are dropped
    * until the quota holds and the advanced cursor offset is returned; the
    * producer-side policies only report (hold/throw is the producer's move —
    * reference: producer_request_hold blocks sends, producer_exception fails
    * them). Returns (statusAfter, newCursorOffset). */
  def enforce(dir: String, cursorOffset: Long, limitBytes: Long,
              policy: Policy): (Status, Long) = {
    val before = check(dir, cursorOffset, limitBytes)
    policy match {
      case ProducerHold | ProducerException => (before, cursorOffset)
      case ConsumerBacklogEviction =>
        if (!before.exceeded) return (before, cursorOffset)
        var cursor = cursorOffset
        var segs = backlogSegs(dir, cursor)
        var bytes = segs.map(_.length()).sum
        while (bytes > limitBytes && segs.nonEmpty) {
          val victim = segs.head
          // advance the cursor past the evicted segment's newest entry
          // (sidecar metadata; scan fallback inside statsFor)
          val maxOff = graft.sources.v2.SegmentStats.statsFor(victim)
            .map(_.maxOff).getOrElse(cursor)
          cursor = math.max(cursor, maxOff)
          victim.delete()
          graft.sources.v2.SegmentStats.sidecarFor(victim).delete()
          segs = backlogSegs(dir, cursor)
          bytes = segs.map(_.length()).sum
        }
        (check(dir, cursor, limitBytes), cursor)
    }
  }
}
