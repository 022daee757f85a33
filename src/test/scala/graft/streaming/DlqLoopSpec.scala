package graft.streaming

import java.nio.file.Files

import scala.util.{Failure, Success, Try}

import graft.SparkSuite
import graft.streaming.DeadLetter.Attempt

/** Full dead-letter loop over the segment log (A6 fixture end-to-end):
  * consume a topic, process with failures, route retries to a retry topic,
  * re-consume the retry topic, and land poison messages in the DLQ topic
  * after maxRedeliverCount — the reconsumeLater → retry-topic → DLQ flow
  * (reference: DeadLetterPolicy; retry flow ConsumerImpl.java:357-383,
  * 622-660: `<topic>-<sub>-RETRY` then `<topic>-<sub>-DLT`). */
class DlqLoopSpec extends SparkSuite {
  import spark.implicits._

  private def writeTopic(dir: String, rows: Seq[(String, String, Long, Int)]): Unit =
    rows.map { case (k, v, o, rc) =>
      ("t", rc, o, k, v, ts("2024-01-01 00:00:01"), ts("2024-01-01 00:00:01"),
        "p", o)
    }.toDF("topic", "partition", "offset", "key", "value", "event_time",
      "publish_time", "producer_name", "sequence_id")
      .coalesce(1).write.format("graft-topic").option("path", dir)
      .mode("append").save()
  // (partition column doubles as redelivery_count carrier in this fixture)

  test("poison messages reach the DLQ topic after maxRedeliverCount hops") {
    val main = Files.createTempDirectory("dlq-main").toFile.getAbsolutePath
    val retry = Files.createTempDirectory("dlq-retry").toFile.getAbsolutePath
    val dlq = Files.createTempDirectory("dlq-dead").toFile.getAbsolutePath
    writeTopic(main, Seq(("k1", "good-1", 0L, 0), ("k2", "poison-a", 1L, 0),
      ("k3", "good-2", 2L, 0), ("k4", "poison-b", 3L, 0)))

    val process: String => Try[String] = v =>
      if (v.startsWith("poison")) Failure(new RuntimeException("boom"))
      else Success(v.toUpperCase)

    val processed = scala.collection.mutable.Buffer.empty[String]
    def consumeHop(topicDir: String): Unit = {
      val batch = spark.read.format("graft-topic").option("path", topicDir)
        .load().select("key", "value", "offset", "partition").collect()
        .map(r => Attempt((r.getString(0), r.getString(1), r.getLong(2)),
          r.getInt(3)))
      val routed = DeadLetter.route(batch.toSeq, maxRedeliverCount = 3) {
        case (_, v, _) => process(v)
      }
      processed ++= routed.ok.map(_._2)
      def emit(dir: String, atts: Seq[Attempt[(String, String, Long)]]): Unit =
        if (atts.nonEmpty)
          atts.map { a =>
            ("t", a.redeliveryCount, a.record._3, a.record._1, a.record._2,
              ts("2024-01-01 00:00:02"), ts("2024-01-01 00:00:02"), "p",
              a.record._3)
          }.toDF("topic", "partition", "offset", "key", "value", "event_time",
            "publish_time", "producer_name", "sequence_id")
            .coalesce(1).write.format("graft-topic").option("path", dir)
            .mode("append").save()
      emit(retry, routed.retry)
      emit(dlq, routed.dead)
    }

    consumeHop(main) // hop 1: goods succeed, poisons -> retry (rc=1)
    assert(processed.sorted == Seq("GOOD-1", "GOOD-2"))
    consumeHop(retry) // hop 2: poisons -> retry again (rc=2)
    consumeHop(retry) // hop 3: rc=3 == max -> DLQ
    // (retry topic is append-only here; each hop reprocesses, rc advances on
    // the latest copies — dedupe by max rc per key for the assertion)
    val dead = spark.read.format("graft-topic").option("path", dlq).load()
      .select("key", "value", "partition").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(dead.map(_._2).toSet == Set("poison-a", "poison-b"))
    assert(dead.forall(_._3 == 3)) // exactly maxRedeliverCount attempts
  }

  test("retry redelivery honors the exponential backoff schedule") {
    import graft.streaming.DeadLetter.RedeliveryBackoff
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val backoff = RedeliveryBackoff(minDelayMs = 1000, maxDelayMs = 4000)
    // min(max, min × 2^(n−1)): 1s, 2s, then capped at 4s
    assert((1 to 6).map(backoff.delayMs) ==
      Seq(1000L, 2000L, 4000L, 4000L, 4000L, 4000L))

    val t0 = ts("2024-01-01 00:00:00").getTime
    val process: ((String, String, Long)) => Try[String] = {
      case (_, v, _) =>
        if (v.startsWith("poison")) Failure(new RuntimeException("boom"))
        else Success(v)
    }
    // hop 1 fails at t0: rc 0→1, redeliverable no earlier than t0+1s
    val (_, s1, _) = DeadLetter.routeWithBackoff(
      Seq(Attempt(("k1", "poison-a", 0L), 0)), 5, backoff, t0)(process)
    assert(s1.head.deliverAtMs == t0 + 1000)
    // hop 2 fails at its redelivery time: rc 1→2, +2s; hop 3: capped +4s
    val (_, s2, _) = DeadLetter.routeWithBackoff(
      s1.map(_.attempt), 5, backoff, s1.head.deliverAtMs)(process)
    assert(s2.head.deliverAtMs == t0 + 1000 + 2000)
    val (_, s3, _) = DeadLetter.routeWithBackoff(
      s2.map(_.attempt), 5, backoff, s2.head.deliverAtMs)(process)
    assert(s3.head.deliverAtMs == t0 + 1000 + 2000 + 4000)

    // the retry-topic hold: the scheduled retry must NOT surface before its
    // deliver-at — delayedDelivery with the watermark as the clock
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[DelayedMsg]
    val delayed = StatefulOps.delayedDelivery(
      in.toDF().withWatermark("deliverAt", "5 seconds").as[DelayedMsg])
    val q = delayed.toDF().writeStream.format("memory")
      .queryName("dlq_backoff").outputMode("append").start()
    in.addData(DelayedMsg("k1", "poison-a#rc1", 0L,
      new java.sql.Timestamp(s1.head.deliverAtMs)))
    q.processAllAvailable()
    assert(spark.table("dlq_backoff").isEmpty) // backoff not yet elapsed
    in.addData(DelayedMsg("tick", "tick", 9L, ts("2024-01-01 00:00:30")))
    q.processAllAvailable() // watermark passes t0+1s → retry released
    val released = spark.table("dlq_backoff").as[DelayedMsg].collect()
    q.stop()
    assert(released.exists(_.value == "poison-a#rc1"))
  }
}
