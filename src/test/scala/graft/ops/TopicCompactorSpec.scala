package graft.ops

import java.nio.file.Files

import graft.SparkSuite
import graft.sources.v2.TopicTable
import org.apache.spark.sql.functions._

/** CompactionTest parity (A4 fixture) over the real segment log: interleaved
  * keys, many updates per key, tombstones, offsets preserved. */
class TopicCompactorSpec extends SparkSuite {
  import spark.implicits._

  private def write(dir: String, rows: Seq[(String, String, Long)]): Unit =
    rows.map { case (k, v, o) =>
      ("t", 0, o, k, v, ts("2024-01-01 00:00:01"), ts("2024-01-01 00:00:01"),
        "p", o)
    }.toDF("topic", "partition", "offset", "key", "value", "event_time",
      "publish_time", "producer_name", "sequence_id")
      .coalesce(1).write.format("graft-topic").option("path", dir)
      .mode("append").save()

  test("expire drops wholly-old segments, keeps straddlers (TTL fast-forward)") {
    val dir = Files.createTempDirectory("expire").toFile.getAbsolutePath
    def writeAt(t: String, rows: Seq[(String, Long)]): Unit =
      rows.map { case (k, o) => ("t", 0, o, k, "v", ts(t), ts(t), "p", o) }
        .toDF("topic", "partition", "offset", "key", "value", "event_time",
          "publish_time", "producer_name", "sequence_id")
        .coalesce(1).write.format("graft-topic").option("path", dir)
        .mode("append").save()
    writeAt("2024-01-01 00:00:00", Seq(("a", 0L), ("b", 1L))) // old
    writeAt("2024-01-05 00:00:00", Seq(("c", 2L), ("d", 3L))) // young
    val removed = TopicCompactor.expire(spark, dir,
      ts("2024-01-03 00:00:00").getTime)
    assert(removed == 1)
    val keys = spark.read.format("graft-topic").option("path", dir).load()
      .select("key").as[String].collect().sorted
    assert(keys.toSeq == Seq("c", "d"))
  }

  test("compaction keeps latest per key, drops tombstoned keys, frees segments") {
    val dir = Files.createTempDirectory("compactor").toFile.getAbsolutePath
    write(dir, Seq(("k1", "v1", 0L), ("k2", "a1", 1L), ("k1", "v2", 2L)))
    write(dir, Seq(("k3", "x1", 3L), ("k2", "a2", 4L), ("k1", "v3", 5L)))
    write(dir, Seq(("k3", null, 6L), ("k4", "r1", 7L))) // tombstone k3
    assert(TopicTable.listSegments(dir).length == 3)

    val (kept, removed) = TopicCompactor.compact(spark, dir)
    assert(kept == 3 && removed == 3)
    assert(TopicTable.listSegments(dir).length == 1)

    val back = spark.read.format("graft-topic").option("path", dir).load()
      .select("key", "value", "offset").as[(String, String, Long)]
      .collect().sortBy(_._1)
    assert(back.toSeq == Seq(("k1", "v3", 5L), ("k2", "a2", 4L),
      ("k4", "r1", 7L))) // k3 tombstoned away; offsets preserved

    // compaction is idempotent
    val (kept2, _) = TopicCompactor.compact(spark, dir)
    assert(kept2 == 3)

    // a consumer seeking by offset still works over the compacted horizon
    val seek = graft.sources.Topics.readerFrom(spark, dir,
      startOffset = Some(5L)).select("key").as[String].collect()
    assert(seek.toSeq.sorted == Seq("k1", "k4"))
  }
}
