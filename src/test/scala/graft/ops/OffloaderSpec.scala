package graft.ops

import java.io.File
import java.nio.file.Files

import graft.SparkSuite
import graft.sources.v2.TopicTable
import org.apache.spark.sql.functions._

/** Tiered-storage offload with transparent read-back and cursor continuity. */
class OffloaderSpec extends SparkSuite {
  import spark.implicits._

  private def writeAt(dir: String, t: String, offs: Range): Unit =
    offs.map { i =>
      ("t", 0, i.toLong, s"k$i", s"v$i", ts(t), ts(t), "p", i.toLong)
    }.toDF("topic", "partition", "offset", "key", "value", "event_time",
      "publish_time", "producer_name", "sequence_id")
      .coalesce(1).write.format("graft-topic").option("path", dir)
      .mode("append").save()

  test("offload moves cold segments; batch reads and pruning see through tiers") {
    val dir = Files.createTempDirectory("offload").toFile.getAbsolutePath
    writeAt(dir, "2024-01-01 00:00:00", 0 until 50)  // cold
    writeAt(dir, "2024-02-01 00:00:00", 50 until 80) // hot
    val moved = Offloader.offload(dir, ts("2024-01-15 00:00:00").getTime)
    assert(moved == 1)
    // the cold segment (and its sidecar) now live under offloaded/
    val cold = new File(dir, s"${TopicTable.OffloadTier}/partition-000")
    assert(cold.listFiles().count(_.getName.endsWith(".jsonl")) == 1)
    assert(cold.listFiles().count(_.getName.endsWith(".meta")) == 1)
    // transparent read-back: all rows visible, pruning still metadata-driven
    val back = spark.read.format("graft-topic").option("path", dir).load()
    assert(back.count() == 80)
    assert(back.where(col("offset") >= 60).count() == 20)
    // recall brings the tier back to hot
    assert(Offloader.recall(dir) == 1)
    assert(spark.read.format("graft-topic").option("path", dir).load()
      .count() == 80)
  }

  test("stream cursor continuity: consumed stays consumed across offload, unconsumed delivers from cold") {
    val dir = Files.createTempDirectory("offload-stream").toFile.getAbsolutePath
    writeAt(dir, "2024-01-01 00:00:00", 0 until 40)
    val q = spark.readStream.format("graft-topic").option("path", dir).load()
      .groupBy().count()
      .writeStream.format("memory").queryName("offload_tail")
      .outputMode("complete").start()
    q.processAllAvailable()
    assert(spark.table("offload_tail").as[Long].head() == 40)
    // offload the (already consumed) segment mid-stream → NO re-delivery,
    // because (partition, name) identity is preserved across tiers
    assert(Offloader.offload(dir, ts("2024-06-01 00:00:00").getTime) == 1)
    q.processAllAvailable()
    assert(spark.table("offload_tail").as[Long].head() == 40)
    // a new cold segment offloaded BEFORE the stream sees it still delivers
    writeAt(dir, "2024-01-02 00:00:00", 100 until 110)
    assert(Offloader.offload(dir, ts("2024-06-01 00:00:00").getTime) == 1)
    q.processAllAvailable()
    val n = spark.table("offload_tail").as[Long].head()
    q.stop()
    assert(n == 50) // delivered straight from the cold tier
  }
}
