package graft.core

import java.nio.file.Files

import graft.SparkSuite

class AdminSpec extends SparkSuite {
  import spark.implicits._

  private def topic(): String = {
    val dir = Files.createTempDirectory("admin").toFile.getAbsolutePath
    (0 until 20).map { i =>
      ("t", 0, i.toLong, s"k${i % 4}", s"v$i",
        ts(f"2024-01-01 00:${i}%02d:00"), ts(f"2024-01-01 00:${i}%02d:00"),
        "p", i.toLong)
    }.toDF("topic", "partition", "offset", "key", "value", "event_time",
      "publish_time", "producer_name", "sequence_id")
      .coalesce(1).write.format("graft-topic").option("path", dir)
      .mode("append").save()
    dir
  }

  test("admin surface: peek / getById / byTimestamp / backlog / skip") {
    val admin = new Admin(spark, topic())
    val peeked = admin.peekMessages(fromOffset = 5, n = 3)
    assert(peeked.map(_.getAs[Long]("offset")).toSeq == Seq(5L, 6L, 7L))

    assert(admin.getMessageById(12).get.getAs[String]("value") == "v12")
    assert(admin.getMessageById(99).isEmpty)

    assert(admin.getMessageIdByTimestamp(
      ts("2024-01-01 00:10:00").getTime).contains(10L))

    val (entries, bytes) = admin.analyzeBacklog(cursorOffset = 14)
    assert(entries == 5 && bytes > 0)

    assert(admin.skipMessages(0, 10).contains(10L))
  }

  test("TableView handle: get / containsKey / size / entrySet") {
    val tv = new TableViewHandle(spark, topic())
    assert(tv.size() == 4)
    assert(tv.get("k3").contains("v19")) // latest offset for k3
    assert(tv.containsKey("k0") && !tv.containsKey("nope"))
    assert(tv.entrySet() == Map("k0" -> "v16", "k1" -> "v17",
      "k2" -> "v18", "k3" -> "v19"))
    // the cap refuses a driver-side materialization of a too-wide keyspace;
    // the streaming iterator handles any size
    assertThrows[IllegalArgumentException](tv.entrySet(maxEntries = 2))
    assert(tv.entries().toMap == tv.entrySet())
    tv.close()
  }

  test("TableView handle materializes ONE snapshot; refresh() re-reads") {
    val dir = topic()
    val tv = new TableViewHandle(spark, dir)
    assert(tv.get("k0").contains("v16"))
    // append a newer value for k0 — invisible until refresh, which proves
    // point gets hit the cached snapshot instead of re-compacting the topic
    Seq(("t", 0, 20L, "k0", "v20", ts("2024-01-01 00:20:00"),
      ts("2024-01-01 00:20:00"), "p", 20L))
      .toDF("topic", "partition", "offset", "key", "value", "event_time",
        "publish_time", "producer_name", "sequence_id")
      .coalesce(1).write.format("graft-topic").option("path", dir)
      .mode("append").save()
    assert(tv.get("k0").contains("v16")) // snapshot semantics, no rescan
    tv.refresh()
    assert(tv.get("k0").contains("v20")) // refreshed snapshot sees the write
    tv.close()
  }
}
