package graft.sources

import java.time.LocalDateTime

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Connector-surface coverage: the Kafka bridge column contract, the
  * Debezium-envelope CDC operators, and the cron batch triggerer. */
class BridgeCdcCronSpec extends SparkSuite {
  import spark.implicits._

  // ------------------------------------------------------------ Kafka bridge

  test("Kafka source contract maps onto the graft envelope and back") {
    val kafka = spark.createDataFrame(
      java.util.List.of(
        Row("k1".getBytes, "v1".getBytes, "orders", 3, 42L,
          ts("2024-01-01 00:00:05"), 0),
        Row(null, "v2".getBytes, "orders", 0, 43L,
          ts("2024-01-01 00:00:06"), 0)),
      KafkaBridge.kafkaSourceSchema)
    val env = KafkaBridge.fromKafka(kafka)
    assert(env.columns.toSeq == Seq("topic", "partition", "offset", "key",
      "value", "event_time", "publish_time", "producer_name", "sequence_id"))
    val r = env.orderBy("offset").collect()
    assert(r(0).getAs[String]("key") == "k1" && r(0).getAs[String]("value") == "v1")
    assert(r(0).getAs[Int]("partition") == 3 && r(0).getAs[Long]("offset") == 42L)
    assert(r(1).isNullAt(r(1).fieldIndex("key"))) // unkeyed kafka record
    assert(r(0).getAs[Long]("sequence_id") == 42L) // offset doubles as seq

    val back = KafkaBridge.toKafka(env, targetTopic = Some("mirror"))
    assert(back.columns.toSeq == Seq("key", "value", "topic"))
    assert(back.select("topic").distinct().as[String].head() == "mirror")

    val opts = KafkaBridge.sourceOptions("broker:9092", Seq("a", "b"),
      startingTimeMs = Some(1000L), maxOffsetsPerTrigger = Some(500L))
    assert(opts("subscribe") == "a,b" && opts("startingTimestamp") == "1000")
    assert(KafkaBridge.sourcePatternOptions("broker:9092", "t-.*")
      .contains("subscribePattern"))
  }

  test("graft topic round-trips through the Kafka bridge columns") {
    // envelope → kafka sink shape → (a kafka hop) → source shape → envelope
    val env = Seq(("t", 0, 7L, "k", "payload", ts("2024-01-01 00:00:00"),
      ts("2024-01-01 00:00:00"), "p", 7L))
      .toDF("topic", "partition", "offset", "key", "value", "event_time",
        "publish_time", "producer_name", "sequence_id")
    val wire = KafkaBridge.toKafka(env)
      .select(encode(col("key"), "UTF-8").as("key"),
        encode(col("value"), "UTF-8").as("value"),
        col("topic"), lit(0).as("partition"), lit(7L).as("offset"),
        lit(ts("2024-01-01 00:00:00")).as("timestamp"),
        lit(0).as("timestampType"))
    val round = KafkaBridge.fromKafka(wire)
    val r = round.head()
    assert(r.getAs[String]("key") == "k" && r.getAs[String]("value") == "payload")
  }

  // -------------------------------------------------------------------- CDC

  test("CDC materialize applies creates/updates/deletes to current state") {
    val t0 = 1000L
    def rows(xs: (Long, String)*) = xs.toSeq.toDF("id", "name")
    val changes =
      Cdc.envelope(rows(1L -> "alice", 2L -> "bob"), Cdc.Creates, lit(t0))
        .union(Cdc.envelope(rows(3L -> "carol"), Cdc.Reads, lit(t0))) // snapshot
        .union(Cdc.envelope(rows(1L -> "alicia"), Cdc.Updates, lit(t0 + 10)))
        .union(Cdc.envelope(rows(2L -> "bob"), Cdc.Deletes, lit(t0 + 20)))
    val state = Cdc.materialize(changes, Seq("id"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(state.toSeq == Seq(1L -> "alicia", 3L -> "carol")) // bob deleted

    val ups = Cdc.asUpserts(changes, Seq("id"))
      .select(col("id"), col("__deleted")).as[(Long, Boolean)]
      .collect().sortBy(_._1)
    assert(ups.toSeq == Seq((1L, false), (2L, true), (3L, false)))
  }

  test("CDC history: abutting validity ranges; is_current slice equals materialize") {
    val t0 = 1000L
    def rows(xs: (Long, String)*) = xs.toSeq.toDF("id", "name")
    val changes =
      Cdc.envelope(rows(1L -> "alice", 2L -> "bob"), Cdc.Creates, lit(t0))
        .union(Cdc.envelope(rows(1L -> "alicia"), Cdc.Updates, lit(t0 + 10)))
        .union(Cdc.envelope(rows(1L -> "alix"), Cdc.Updates, lit(t0 + 20)))
        .union(Cdc.envelope(rows(2L -> "bob"), Cdc.Deletes, lit(t0 + 20)))
    val h = Cdc.history(changes, Seq("id"))
      .select(col("id"), col("op"), col("after.name").as("name"),
        col("valid_from"), col("valid_to"), col("is_current"))
      .as[(Long, String, String, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._4)).toSeq
    assert(h == Seq(
      (1L, "c", "alice", 1000L, Some(1010L), false),
      (1L, "u", "alicia", 1010L, Some(1020L), false),
      (1L, "u", "alix", 1020L, None, true),
      (2L, "c", "bob", 1000L, Some(1020L), false),
      (2L, "d", null, 1020L, None, false))) // tombstone is never current
    // ranges abut per key; exactly the open non-deleted version is current
    val current = h.filter(_._6).map(r => r._1 -> r._3)
    val mat = Cdc.materialize(changes, Seq("id"))
      .as[(Long, String)].collect().toSeq
    assert(current.sorted == mat.sorted,
      "materialize must equal the is_current slice of history")
  }

  test("CDC delete wins a same-timestamp tie (emission order)") {
    val changes =
      Cdc.envelope(Seq(1L -> "x").toDF("id", "name"), Cdc.Creates, lit(5L))
        .union(Cdc.envelope(Seq(1L -> "x").toDF("id", "name"), Cdc.Deletes, lit(5L)))
    assert(Cdc.materialize(changes, Seq("id")).isEmpty)
  }

  // ------------------------------------------------------------------- cron

  test("cron schedule: steps, ranges, and next-fire computation") {
    val s = CronTriggerer.parse("*/15 * * * *")
    assert(s.nextAfter(LocalDateTime.of(2024, 1, 1, 10, 7)) ==
      LocalDateTime.of(2024, 1, 1, 10, 15))
    assert(s.nextAfter(LocalDateTime.of(2024, 1, 1, 10, 45)) ==
      LocalDateTime.of(2024, 1, 1, 11, 0))

    val weekdays9 = CronTriggerer.parse("30 9 * * 1-5")
    // 2024-01-06 is a Saturday → next fire Monday the 8th, 09:30
    assert(weekdays9.nextAfter(LocalDateTime.of(2024, 1, 6, 0, 0)) ==
      LocalDateTime.of(2024, 1, 8, 9, 30))

    // one fire per quarter hour in a 2h window
    assert(s.fireTimes(LocalDateTime.of(2024, 1, 1, 0, 0),
      LocalDateTime.of(2024, 1, 1, 2, 0)).size == 8)
  }

  test("cron dom/dow OR rule and validation") {
    // "13th of the month OR a Friday" — both restricted → OR (classic cron)
    val s = CronTriggerer.parse("0 0 13 * 5")
    assert(s.matches(LocalDateTime.of(2024, 9, 13, 0, 0))) // Fri the 13th
    assert(s.matches(LocalDateTime.of(2024, 9, 6, 0, 0)))  // a Friday
    assert(s.matches(LocalDateTime.of(2024, 8, 13, 0, 0))) // a Tuesday the 13th
    assert(!s.matches(LocalDateTime.of(2024, 9, 12, 0, 0)))
    // Sunday can be written 0 or 7
    assert(CronTriggerer.parse("0 0 * * 7").matches(
      LocalDateTime.of(2024, 1, 7, 0, 0))) // a Sunday
    intercept[IllegalArgumentException](CronTriggerer.parse("0 0 * *"))
    intercept[IllegalArgumentException](CronTriggerer.parse("61 0 * * *"))
  }

  test("cron driver loop fires on schedule under virtual time, no drift") {
    val s = CronTriggerer.parse("*/15 * * * *")
    val start = LocalDateTime.of(2024, 1, 1, 0, 7)
    var clock = start
    val fired = Seq.newBuilder[LocalDateTime]
    val n = CronTriggerer.runLoop(s,
      runPass = at => {
        fired += at
        // a pass that OVERRUNS the next fire: the loop must not skip it
        if (at.getMinute == 30) clock = clock.plusMinutes(20)
      },
      now = () => start,
      sleepUntil = at => { if (at.isAfter(clock)) clock = at },
      maxFires = 4)
    assert(n == 4)
    // anchored at :07 → :15, :30, (overrun to :50) → :45 runs immediately,
    // then :00 — exactly the schedule's fire sequence, no drift, no skips
    assert(fired.result() == s.fireTimes(start, start.plusHours(1)).take(4))
  }

  test("cron driver loop drives real AvailableNow passes over a topic") {
    def tmpDir() = java.nio.file.Files
      .createTempDirectory("graft-cron").toFile.getAbsolutePath
    val dir = tmpDir()
    def writeBatch(ids: Range): Unit =
      ids.map(i => (("t", 0, i.toLong, s"k$i", s"v$i"): (String, Int, Long, String, String)))
        .toDF("topic", "partition", "offset", "key", "value")
        .write.format("graft-topic").mode("append").option("path", dir).save()
    writeBatch(0 until 10)
    val out = tmpDir()
    val counts = Seq.newBuilder[Long]
    val s = CronTriggerer.parse("*/5 * * * *")
    var clock = LocalDateTime.of(2024, 6, 1, 12, 0)
    CronTriggerer.runLoop(s,
      runPass = _ => {
        // one bounded pass: drain everything available now, then stop —
        // the Trigger.AvailableNow lifecycle the cron loop exists to drive
        val q = spark.readStream.format("graft-topic").option("path", dir)
          .load()
          .writeStream.format("parquet")
          .option("path", out)
          .option("checkpointLocation", s"$out/_chk")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        counts += spark.read.parquet(out).count()
        writeBatch(10 until 15) // lands between fires; next pass drains it
      },
      now = () => clock,
      sleepUntil = at => clock = at,
      maxFires = 2)
    // pass 1 drained the initial 10; pass 2 drained ONLY the 5 that arrived
    // after it (checkpointed cursor, no re-read)
    assert(counts.result() == Seq(10L, 15L))
  }
}
