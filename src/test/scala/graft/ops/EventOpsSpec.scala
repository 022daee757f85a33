package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class EventOpsSpec extends SparkSuite {
  import spark.implicits._

  private def events = Seq(
    (0L, ts("2024-01-01 00:00:00"), "a"),
    (1L, ts("2024-01-01 01:00:00"), "b"),
    (2L, ts("2024-01-01 02:00:00"), "c"),
    (3L, ts("2024-01-01 12:00:00"), "d")
  ).toDF("offset", "publish_time", "v")

  test("lateSplit flags rows older than max event time minus lag") {
    val out = EventOps.lateSplit(events, "publish_time", lagSeconds = 3 * 3600)
      .select("v", "is_late").as[(String, Boolean)].collect().toMap
    // watermark = 12:00 − 3h = 09:00 → a, b, c late; d on time
    assert(out == Map("a" -> true, "b" -> true, "c" -> true, "d" -> false))
  }

  test("ttlKeep drops messages older than the ttl at a given now") {
    val now = lit(ts("2024-01-01 12:00:00"))
    val kept = events
      .where(EventOps.ttlKeep(col("publish_time"), now, ttlSeconds = 2 * 3600))
      .select("v").as[String].collect()
    assert(kept.toSet == Set("d")) // only within the last 2h of 12:00
  }

  test("delayedDue is an inclusive cutoff predicate") {
    val due = events
      .where(EventOps.delayedDue(col("publish_time"),
        lit(ts("2024-01-01 01:00:00"))))
      .select("v").as[String].collect()
    assert(due.toSet == Set("a", "b")) // 01:00 itself is due
  }

  test("backlog counts entries and bytes in an offset range") {
    val r = EventOps.backlog(events, "offset", length(col("v")), 0L, 2L)
      .as[(Long, Long)].collect().head
    assert(r == ((2L, 2L))) // offsets 1,2; one byte each
  }
}
