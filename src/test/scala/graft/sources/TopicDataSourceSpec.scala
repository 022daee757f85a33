package graft.sources

import java.nio.file.Files

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

class TopicDataSourceSpec extends SparkSuite {
  import spark.implicits._

  private def envelopeDf(offsets: Range, producer: String = "p0"): DataFrame =
    offsets.map { i =>
      ("t1", 0, i.toLong, s"k${i % 3}", s"v$i",
        ts(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"),
        ts(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"), producer, i.toLong)
    }.toDF("topic", "partition", "offset", "key", "value", "event_time",
      "publish_time", "producer_name", "sequence_id")

  private def tmpDir() =
    Files.createTempDirectory("graft-topic").toFile.getAbsolutePath

  test("batch write → batch read round-trips the envelope") {
    val dir = tmpDir()
    envelopeDf(0 until 100).write.format("graft-topic")
      .option("path", dir).mode("append").save()
    val back = spark.read.format("graft-topic").option("path", dir).load()
    assert(back.count() == 100)
    val r = back.orderBy("offset").select("key", "value", "sequence_id")
      .as[(String, String, Long)].head()
    assert(r == (("k0", "v0", 0L)))
    // event_time round-trips at ms precision
    val t = back.orderBy("offset").select("event_time").head().getTimestamp(0)
    assert(t == ts("2024-01-01 00:00:00"))
  }

  test("offset filter prunes whole segments (seek analog)") {
    val dir = tmpDir()
    // three sealed segments: offsets 0-99, 100-199, 200-299
    envelopeDf(0 until 100).coalesce(1).write.format("graft-topic")
      .option("path", dir).mode("append").save()
    envelopeDf(100 until 200).coalesce(1).write.format("graft-topic")
      .option("path", dir).mode("append").save()
    envelopeDf(200 until 300).coalesce(1).write.format("graft-topic")
      .option("path", dir).mode("append").save()
    assert(graft.sources.v2.TopicTable.listSegments(dir).length == 3)

    val q = spark.read.format("graft-topic").option("path", dir).load()
      .where(col("offset") >= 150L)
    assert(q.count() == 150)
    val scan = q.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.get
    assert(scan.inputRDD.getNumPartitions == 2) // first segment pruned
  }

  test("publish_time filter prunes segments (seek-by-timestamp)") {
    val dir = tmpDir()
    envelopeDf(0 until 60).coalesce(1).write.format("graft-topic")
      .option("path", dir).mode("append").save()
    envelopeDf(60 until 120).coalesce(1).write.format("graft-topic")
      .option("path", dir).mode("append").save()
    val q = spark.read.format("graft-topic").option("path", dir).load()
      .where(col("publish_time") >= lit(ts("2024-01-01 00:01:00")))
    assert(q.count() == 60)
    val parts = q.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.get.inputRDD.getNumPartitions
    assert(parts == 1)
  }

  test("pruning uses the .meta sidecar; deleting it falls back to a scan") {
    val dir = tmpDir()
    envelopeDf(0 until 50).coalesce(1).write.format("graft-topic")
      .option("path", dir).mode("append").save()
    envelopeDf(50 until 100).coalesce(1).write.format("graft-topic")
      .option("path", dir).mode("append").save()
    val segs = graft.sources.v2.TopicTable.listSegments(dir)
    // writer dropped one sidecar per segment
    assert(segs.forall(s => graft.sources.v2.SegmentStats.sidecarFor(s).exists()))
    def prunedCount() = {
      val q = spark.read.format("graft-topic").option("path", dir).load()
        .where(col("offset") >= 50L)
      q.queryExecution.executedPlan.collectFirst {
        case b: BatchScanExec => b
      }.get.inputRDD.getNumPartitions
    }
    assert(prunedCount() == 1) // sidecar path
    segs.foreach(s => graft.sources.v2.SegmentStats.sidecarFor(s).delete())
    assert(prunedCount() == 1) // scan fallback gives identical pruning
  }

  test("column pruning reaches the reader") {
    val dir = tmpDir()
    envelopeDf(0 until 10).write.format("graft-topic")
      .option("path", dir).mode("append").save()
    val q = spark.read.format("graft-topic").option("path", dir).load()
      .select("key")
    val scan = q.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.get
    assert(scan.scan.readSchema().fieldNames.toSeq == Seq("key"))
  }

  test("micro-batch stream tails new segments with checkpointable offsets") {
    val dir = tmpDir()
    envelopeDf(0 until 50).coalesce(1).write.format("graft-topic")
      .option("path", dir).mode("append").save()
    val q = spark.readStream.format("graft-topic").option("path", dir).load()
      .groupBy($"key").count()
      .writeStream.format("memory").queryName("topic_tail")
      .outputMode("complete").start()
    q.processAllAvailable()
    assert(spark.table("topic_tail").as[(String, Long)].collect()
      .map(_._2).sum == 50)
    // a new sealed segment arrives → next micro-batch picks up exactly it
    envelopeDf(50 until 80).coalesce(1).write.format("graft-topic")
      .option("path", dir).mode("append").save()
    q.processAllAvailable()
    val total = spark.table("topic_tail").as[(String, Long)].collect()
      .map(_._2).sum
    q.stop()
    assert(total == 80)
  }

  test("maxSegmentsPerTrigger paces admission across micro-batches") {
    val dir = tmpDir()
    (0 until 3).foreach(i => envelopeDf(i * 10 until (i + 1) * 10)
      .coalesce(1).write.format("graft-topic").option("path", dir)
      .mode("append").save())
    val q = spark.readStream.format("graft-topic").option("path", dir)
      .option("maxSegmentsPerTrigger", "1").load()
      .groupBy().count()
      .writeStream.format("memory").queryName("paced")
      .outputMode("complete").start()
    q.processAllAvailable()
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    val total = spark.table("paced").as[Long].head()
    q.stop()
    assert(total == 30)
    assert(batches.length == 3) // one sealed segment admitted per trigger
    assert(batches.forall(_.numInputRows == 10))
  }

  test("startingTime seeks the stream past wholly-older segments") {
    val dir = tmpDir()
    envelopeDf(0 until 60).coalesce(1).write.format("graft-topic")
      .option("path", dir).mode("append").save() // publish_time < 00:01
    envelopeDf(60 until 120).coalesce(1).write.format("graft-topic")
      .option("path", dir).mode("append").save() // publish_time >= 00:01
    val q = spark.readStream.format("graft-topic").option("path", dir)
      .option("startingTime", ts("2024-01-01 00:01:00").getTime.toString)
      .load()
      .groupBy().count()
      .writeStream.format("memory").queryName("seeked")
      .outputMode("complete").start()
    q.processAllAvailable()
    val n = spark.table("seeked").as[Long].head()
    q.stop()
    assert(n == 60) // first segment skipped entirely
  }

  test("streaming write: epoch-named segments are idempotent on replay") {
    val dir = tmpDir()
    val src = tmpDir()
    envelopeDf(0 until 30).coalesce(1).write.format("graft-topic")
      .option("path", src).mode("append").save()
    val cp = tmpDir()
    def run(): Unit = {
      val q = spark.readStream.format("graft-topic").option("path", src).load()
        .writeStream.format("graft-topic").option("path", dir)
        .option("checkpointLocation", cp).start()
      q.processAllAvailable(); q.stop()
    }
    run()
    val n1 = spark.read.format("graft-topic").option("path", dir).load().count()
    run() // restart from checkpoint: no duplicate rows
    val n2 = spark.read.format("graft-topic").option("path", dir).load().count()
    assert(n1 == 30 && n2 == 30)
  }
}
