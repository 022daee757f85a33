package graft.ops

import java.nio.file.Files

import graft.SparkSuite
import graft.sources.v2.TopicTable

/** BacklogQuota policies over the segment log (limitSize +
  * consumer_backlog_eviction; reference BacklogQuota.java:81-89). */
class BacklogQuotaSpec extends SparkSuite {
  import spark.implicits._

  private def topicWithSegments(n: Int, rowsPer: Int = 50): String = {
    val dir = Files.createTempDirectory("quota").toFile.getAbsolutePath
    (0 until n).foreach { s =>
      (0 until rowsPer).map { i =>
        val off = (s * rowsPer + i).toLong
        ("t", 0, off, s"k$i", "v" * 20, ts("2024-01-01 00:00:01"),
          ts("2024-01-01 00:00:01"), "p", off)
      }.toDF("topic", "partition", "offset", "key", "value", "event_time",
        "publish_time", "producer_name", "sequence_id")
        .coalesce(1).write.format("graft-topic").option("path", dir)
        .mode("append").save()
    }
    dir
  }

  test("check is metadata-only and sees exactly the backlog segments") {
    val dir = topicWithSegments(4)
    val all = BacklogQuota.check(dir, cursorOffset = -1, limitBytes = 1L)
    assert(all.backlogSegments == 4 && all.exceeded)
    // cursor inside segment 3 (offsets 100-149): only segments 3 and 4 remain
    val part = BacklogQuota.check(dir, cursorOffset = 120, limitBytes = Long.MaxValue)
    assert(part.backlogSegments == 2 && !part.exceeded)
  }

  test("producer policies report without mutating; eviction drops oldest") {
    val dir = topicWithSegments(4)
    val segBytes = TopicTable.listSegments(dir).map(_.length()).sum
    val limit = segBytes / 2 // roughly two segments worth

    val (holdStatus, holdCursor) =
      BacklogQuota.enforce(dir, -1, limit, BacklogQuota.ProducerHold)
    assert(holdStatus.exceeded && holdCursor == -1)
    assert(TopicTable.listSegments(dir).length == 4) // nothing deleted

    val (after, cursor) =
      BacklogQuota.enforce(dir, -1, limit, BacklogQuota.ConsumerBacklogEviction)
    assert(!after.exceeded)
    assert(cursor > -1) // cursor advanced past evicted segments
    val left = TopicTable.listSegments(dir)
    assert(left.length < 4 && left.nonEmpty)
    // the OLDEST segments were the victims: remaining ones hold the newest offsets
    val minLeft = graft.sources.v2.SegmentStats.statsFor(left.head).get.minOff
    assert(minLeft > 0 && cursor == minLeft - 1 || cursor >= minLeft - 1)
    // surviving data still reads cleanly
    assert(spark.read.format("graft-topic").option("path", dir).load()
      .count() == left.length * 50L)
  }

  test("eviction drops by DATA age, not name order, across mixed families") {
    val dir = Files.createTempDirectory("quota-mixed").toFile.getAbsolutePath
    // an OLD streaming-epoch segment ("e" family, offsets 0-49)…
    val pdir = new java.io.File(dir, "partition-000"); pdir.mkdirs()
    val oldLines = (0 until 50).map { i =>
      s"""{"topic":"t","partition":0,"offset":$i,"key":"k$i","value":"${"v" * 20}","event_time_ms":0,"publish_time_ms":0,"producer_name":"p","sequence_id":$i}"""
    }
    java.nio.file.Files.write(
      new java.io.File(pdir, "segment-eaaaaaaaa0000000001-p00000.jsonl").toPath,
      oldLines.mkString("\n").getBytes("UTF-8"))
    // …then a NEWER batch append ("b" family, offsets 100-149), which sorts
    // BELOW "e" names lexicographically
    (0 until 1).foreach { _ =>
      (100 until 150).map { i =>
        ("t", 0, i.toLong, s"k$i", "v" * 20, ts("2024-01-01 00:00:01"),
          ts("2024-01-01 00:00:01"), "p", i.toLong)
      }.toDF("topic", "partition", "offset", "key", "value", "event_time",
        "publish_time", "producer_name", "sequence_id")
        .coalesce(1).write.format("graft-topic").option("path", dir)
        .mode("append").save()
    }
    // limit sized to exactly fit the newer batch segment: correct eviction
    // removes only the old epoch segment
    val bSize = TopicTable.listSegments(dir)
      .filter(_.getName.startsWith("segment-b")).map(_.length()).sum
    val (after, cursor) = BacklogQuota.enforce(dir, -1, bSize,
      BacklogQuota.ConsumerBacklogEviction)
    // the OLD epoch segment (max offset 49) is the victim, not the fresh
    // batch segment whose "b" name merely sorts first
    val left = TopicTable.listSegments(dir)
    assert(left.length == 1 && left.head.getName.startsWith("segment-b"))
    assert(cursor == 49 && !after.exceeded)
    assert(spark.read.format("graft-topic").option("path", dir).load()
      .agg(org.apache.spark.sql.functions.min("offset")).head().getLong(0) == 100L)
  }
}
