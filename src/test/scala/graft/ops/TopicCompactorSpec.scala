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

    val (kept, removed) = TopicCompactor.compact(spark, dir, targetSegments = 2)
    assert(kept == 3 && removed == 3)
    val segs = TopicTable.listSegments(dir).length
    assert(segs >= 1 && segs <= 2) // ranged parallel write, old segments freed

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

  test("tailing across compaction: offsets are preserved, dedup-by-offset guards replays") {
    // The segment-level cursor consumed the OLD segment names; compaction
    // writes the horizon under NEW names, so a live tail re-receives the
    // compacted rows (same offsets). dropDuplicates on (partition, offset)
    // is the downstream guard — offsets are stable across compaction, which
    // is exactly why the compactor preserves them.
    val dir = Files.createTempDirectory("compact-tail").toFile.getAbsolutePath
    write(dir, Seq(("k1", "v1", 0L), ("k2", "a1", 1L)))
    write(dir, Seq(("k1", "v2", 2L), ("k3", "c1", 3L)))
    val q = spark.readStream.format("graft-topic").option("path", dir).load()
      .dropDuplicates("partition", "offset")
      .writeStream.format("memory").queryName("compact_tail")
      .outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table("compact_tail").count() == 4)
    TopicCompactor.compact(spark, dir, targetSegments = 2)
    q.processAllAvailable()
    // compacted segments re-delivered but offset-deduped: no new rows
    assert(spark.table("compact_tail").count() == 4)
    // fresh appends after compaction flow through normally
    write(dir, Seq(("k4", "d1", 4L)))
    q.processAllAvailable()
    val n = spark.table("compact_tail").count()
    q.stop()
    assert(n == 5)
  }

  test("compacted horizon is written distributed: many segments, sorted within") {
    val dir = Files.createTempDirectory("compactor-dist").toFile.getAbsolutePath
    // two topic partitions, 100 keys each, several updates per key
    (0 until 2).foreach { p =>
      (0 until 300).map { i =>
        ("t", p, (p * 1000 + i).toLong, s"k$p-${i % 100}", s"v$i",
          ts("2024-01-01 00:00:01"), ts("2024-01-01 00:00:01"), "p",
          (p * 1000 + i).toLong)
      }.toDF("topic", "partition", "offset", "key", "value", "event_time",
        "publish_time", "producer_name", "sequence_id")
        .coalesce(1).write.format("graft-topic").option("path", dir)
        .mode("append").save()
    }
    val (kept, removed) = TopicCompactor.compact(spark, dir, targetSegments = 4)
    assert(kept == 200 && removed == 2)
    val segs = TopicTable.listSegments(dir)
    assert(segs.length > 1) // NOT one coalesced writer task
    // both partition dirs hold compacted data; offsets sorted within each segment
    assert(segs.map(_.getParentFile.getName).toSet ==
      Set("partition-000", "partition-001"))
    segs.foreach { f =>
      val offs = scala.io.Source.fromFile(f, "UTF-8").getLines()
        .map(l => """"offset":(\d+)""".r.findFirstMatchIn(l).get.group(1).toLong)
        .toSeq
      assert(offs == offs.sorted, s"offsets unsorted in ${f.getName}")
    }
    // latest-per-key survives
    val back = spark.read.format("graft-topic").option("path", dir).load()
    assert(back.count() == 200)
    assert(back.where(col("key") === "k0-99").select("value").as[String]
      .head() == "v299")
  }
}
