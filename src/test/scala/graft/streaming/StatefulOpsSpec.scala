package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

/** MemoryStream-driven semantics tests mirroring the reference's
  * WindowManagerTest / CompactionTest / ClientDeduplicationTest scenarios. */
class StatefulOpsSpec extends SparkSuite {
  import spark.implicits._

  private var qn = 0
  private def runToMemory(df: org.apache.spark.sql.DataFrame,
                          mode: String): (StreamingQuery, String) = {
    qn += 1
    val name = s"statefulops_out$qn"
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    (q, name)
  }

  test("tableViewStream upserts last value per key across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KeyedMsg]
    val (q, name) = runToMemory(
      StatefulOps.tableViewStream(in.toDS()).toDF(), "update")
    in.addData(KeyedMsg("k1", "v1", 0L, ts("2024-01-01 00:00:00")),
      KeyedMsg("k2", "a1", 1L, ts("2024-01-01 00:00:01")))
    q.processAllAvailable()
    in.addData(KeyedMsg("k1", "v2", 5L, ts("2024-01-01 00:00:02")),
      KeyedMsg("k1", "stale", 3L, ts("2024-01-01 00:00:03")))
    q.processAllAvailable()
    val rows = spark.table(name).as[KeyUpdate].collect()
    q.stop()
    // Latest emission per key reflects highest offset ever seen.
    val latest = rows.groupBy(_.key).map { case (k, v) => k -> v.maxBy(_.offset) }
    assert(latest("k1").value == "v2" && latest("k1").offset == 5L)
    assert(latest("k2").value == "a1")
  }

  test("tableViewStream: stale batches emit nothing; tombstone deletes the key") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KeyedMsg]
    val (q, name) = runToMemory(
      StatefulOps.tableViewStream(in.toDS()).toDF(), "update")
    in.addData(KeyedMsg("k1", "v1", 5L, ts("2024-01-01 00:00:00")))
    q.processAllAvailable()
    in.addData(KeyedMsg("k1", "stale", 3L, ts("2024-01-01 00:00:01")))
    q.processAllAvailable()
    // the stale-only batch fired no listener (old behavior re-emitted v1)
    assert(spark.table(name).count() == 1)
    // tombstone: emits the delete notification; the stored entry keeps the
    // offset high-water mark
    in.addData(KeyedMsg("k1", null, 9L, ts("2024-01-01 00:00:02")))
    q.processAllAvailable()
    val rows2 = spark.table(name).as[KeyUpdate].collect()
    assert(rows2.length == 2 &&
      rows2.exists(r => r.offset == 9L && r.value == null))
    // an OLDER redelivered offset must NOT resurrect the deleted key
    in.addData(KeyedMsg("k1", "stale2", 7L, ts("2024-01-01 00:00:03")))
    q.processAllAvailable()
    assert(spark.table(name).count() == 2)
    // a genuinely newer write re-creates it
    in.addData(KeyedMsg("k1", "v2", 11L, ts("2024-01-01 00:00:04")))
    q.processAllAvailable()
    val rows3 = spark.table(name).as[KeyUpdate].collect()
    q.stop()
    assert(rows3.exists(r => r.offset == 11L && r.value == "v2"))
  }

  test("tumblingCountWindow emits complete windows of exactly N, in order") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KeyedMsg]
    val (q, name) = runToMemory(
      StatefulOps.tumblingCountWindow(in.toDS(), 3).toDF(), "append")
    val t0 = ts("2024-01-01 00:00:00")
    in.addData((1 to 5).map(i => KeyedMsg("k", s"v$i", i.toLong, t0)): _*)
    q.processAllAvailable()
    in.addData(KeyedMsg("k", "v6", 6L, t0), KeyedMsg("k", "v7", 7L, t0))
    q.processAllAvailable()
    val wins = spark.table(name).as[CountWindow].collect().sortBy(_.windowId)
    q.stop()
    assert(wins.length == 2)
    assert(wins(0).values == Seq("v1", "v2", "v3"))
    assert(wins(1).values == Seq("v4", "v5", "v6")) // completed by batch 2
    assert(wins.forall(_.size == 3))
  }

  test("slidingCountWindow emits window of last N every slide records") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KeyedMsg]
    val (q, name) = runToMemory(
      StatefulOps.slidingCountWindow(in.toDS(), windowLength = 3, slide = 2)
        .toDF(), "append")
    val t0 = ts("2024-01-01 00:00:00")
    in.addData((1 to 6).map(i => KeyedMsg("k", s"v$i", i.toLong, t0)): _*)
    q.processAllAvailable()
    val wins = spark.table(name).as[CountWindow].collect().sortBy(_.windowId)
    q.stop()
    // emits at records 2, 4, 6 with the last up-to-3 records each time
    assert(wins.map(_.values.toList).toList ==
      List(List("v1", "v2"), List("v2", "v3", "v4"), List("v4", "v5", "v6")))
  }

  test("countTriggerTimeEvict fires every Nth record with a time-bounded window") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KeyedMsg]
    val (q, name) = runToMemory(
      StatefulOps.countTriggerTimeEvict(in.toDS(), triggerCount = 2,
        windowDurationMs = 60000).toDF(), "append")
    in.addData(
      KeyedMsg("k", "a", 1L, ts("2024-01-01 00:00:00")),
      KeyedMsg("k", "b", 2L, ts("2024-01-01 00:00:30")), // trigger 1
      KeyedMsg("k", "c", 3L, ts("2024-01-01 00:02:00")),
      KeyedMsg("k", "d", 4L, ts("2024-01-01 00:02:10"))) // trigger 2
    q.processAllAvailable()
    val wins = spark.table(name).as[CountWindow].collect().sortBy(_.windowId)
    q.stop()
    assert(wins.length == 2)
    assert(wins(0).values == Seq("a", "b")) // both within 60s of b
    assert(wins(1).values == Seq("c", "d")) // a,b evicted: older than 60s
  }

  test("watermarkCountWindow cuts windows in event-time order despite arrival order") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KeyedMsg]
    val windows = StatefulOps.watermarkCountWindow(
      in.toDF().withWatermark("eventTime", "0 seconds").as[KeyedMsg], 2)
    val (q, name) = runToMemory(windows.toDF(), "append")
    // arrive OUT of event-time order: :30, :10, :20, :40
    in.addData(
      KeyedMsg("k", "c", 3L, ts("2024-01-01 00:00:30")),
      KeyedMsg("k", "a", 1L, ts("2024-01-01 00:00:10")),
      KeyedMsg("k", "b", 2L, ts("2024-01-01 00:00:20")),
      KeyedMsg("k", "d", 4L, ts("2024-01-01 00:00:40")))
    q.processAllAvailable()
    // advance the watermark past everything buffered
    in.addData(KeyedMsg("k2", "tick", 9L, ts("2024-01-01 00:10:00")))
    q.processAllAvailable()
    in.addData(KeyedMsg("k2", "tick2", 10L, ts("2024-01-01 00:20:00")))
    q.processAllAvailable()
    val wins = spark.table(name).as[CountWindow]
      .collect().filter(_.key == "k").sortBy(_.windowId)
    q.stop()
    // windows are (a,b) and (c,d): EVENT-time order, not arrival order
    assert(wins.map(_.values.toList).toList ==
      List(List("a", "b"), List("c", "d")))
  }

  test("delayedDelivery releases messages only once watermark passes deliverAt") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[DelayedMsg]
    // Watermark lags max(deliverAt) by 25s, so releases are staged as the
    // stream advances — the delayed-tracker holdback made observable.
    val delayed = StatefulOps.delayedDelivery(
      in.toDF().withWatermark("deliverAt", "25 seconds").as[DelayedMsg])
    val (q, name) = runToMemory(delayed.toDF(), "append")
    in.addData(
      DelayedMsg("k", "early", 1L, ts("2024-01-01 00:00:10")),
      DelayedMsg("k", "late", 2L, ts("2024-01-01 00:00:30")),
      DelayedMsg("k", "marker", 0L, ts("2024-01-01 00:00:05")))
    q.processAllAvailable()
    // wm settles at :30-25s = :05; the timer at :05 fires only when the
    // watermark strictly passes it → nothing released yet
    val after1 = spark.table(name).as[DelayedMsg].collect()
    assert(after1.isEmpty)
    // advance wm to :40-25s = :15 → the :05 timer fires; marker (:05) and
    // early (:10) are due, late (:30) still held
    in.addData(DelayedMsg("k2", "tick", 3L, ts("2024-01-01 00:00:40")))
    q.processAllAvailable()
    val after2 = spark.table(name).as[DelayedMsg].collect()
    assert(after2.map(_.value).toSet == Set("marker", "early"))
    // advance wm to :60-25s = :35 → late (:30) released
    in.addData(DelayedMsg("k3", "tick2", 4L, ts("2024-01-01 00:01:00")))
    q.processAllAvailable()
    val after3 = spark.table(name).as[DelayedMsg].collect()
    q.stop()
    assert(after3.map(_.value).toSet == Set("marker", "early", "late"))
  }

  test("delayedDeliveryBounded defers far-future messages out of state (bucket spill)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[DelayedMsg]
    val routed = StatefulOps.delayedDeliveryBounded(
      in.toDF().withWatermark("deliverAt", "10 seconds").as[DelayedMsg],
      horizonMs = 60000L, bucketMs = 3600000L) // 1 min horizon, 1h buckets
    val (q, name) = runToMemory(routed.toDF(), "append")
    // batch 1 only advances the watermark (wm starts at 0 → everything far)
    in.addData(DelayedMsg("wm", "tick", 0L, ts("2024-01-01 00:00:20")))
    q.processAllAvailable()
    // wm ≈ :10. near = due within 1 min of wm; far = hours out
    in.addData(
      DelayedMsg("k", "near", 1L, ts("2024-01-01 00:00:40")),
      DelayedMsg("k", "far", 2L, ts("2024-01-01 03:30:00")))
    q.processAllAvailable()
    val afterRoute = spark.table(name).as[DelayedRoute].collect()
    // far-future message was NOT buffered: deferred immediately with its
    // bucket ("tick" was also deferred — at the epoch-0 bootstrap watermark
    // everything is beyond the horizon, which is the safe direction)
    val deferred = afterRoute.filter(_.disposition == "defer")
    assert(deferred.exists(_.value == "far") && !deferred.exists(_.value == "near"))
    assert(deferred.find(_.value == "far").get.bucket ==
      ts("2024-01-01 03:30:00").getTime / 3600000L)
    assert(StatefulOps.delayedBucketDir(deferred.head.bucket)
      .startsWith("partition-"))
    // advance the watermark past the near message's deliverAt → released
    in.addData(DelayedMsg("wm", "tick2", 3L, ts("2024-01-01 00:01:30")))
    q.processAllAvailable()
    val released = spark.table(name).as[DelayedRoute].collect()
    q.stop()
    assert(released.exists(r => r.value == "near" && r.disposition == "deliver"))
    // the far message never surfaced as a delivery from THIS operator's state
    assert(!released.exists(r => r.value == "far" && r.disposition == "deliver"))
  }

  test("throttleByKey caps per-trigger dispatch and drains without dropping") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KeyedMsg]
    val (q, name) = runToMemory(
      StatefulOps.throttleByKey(in.toDS(), maxPerTrigger = 2).toDF(), "append")
    val t0 = ts("2024-01-01 00:00:00")
    in.addData((1 to 5).map(i => KeyedMsg("k", s"v$i", i.toLong, t0)): _*)
    q.processAllAvailable()
    assert(spark.table(name).count() == 2) // capped at 2 for this trigger
    // new data for the key delivers fresh permits: drains 2 per batch
    in.addData(KeyedMsg("k", "v6", 6L, t0))
    q.processAllAvailable()
    assert(spark.table(name).count() == 4) // v3, v4
    in.addData(KeyedMsg("k", "v7", 7L, t0))
    q.processAllAvailable()
    in.addData(KeyedMsg("k", "v8", 8L, t0))
    q.processAllAvailable()
    val vals = spark.table(name).where(col("key") === "k")
      .as[KeyedMsg].collect().sortBy(_.offset).map(_.value)
    q.stop()
    // all emitted in offset order, nothing dropped, never >2 per trigger
    assert(vals.toSeq == Seq("v1", "v2", "v3", "v4", "v5", "v6", "v7", "v8"))
  }

  test("dedupByProducerSeq drops redelivered duplicates within watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SeqMsg]
    val df = in.toDF()
      .withColumnRenamed("producerName", "producer_name")
      .withColumnRenamed("sequenceId", "sequence_id")
    val deduped = StatefulOps.dedupByProducerSeq(df, "eventTime", "10 minutes")
    val (q, name) = runToMemory(deduped, "append")
    in.addData(
      SeqMsg("p1", 1L, "a", ts("2024-01-01 00:00:00")),
      SeqMsg("p1", 1L, "a-dup", ts("2024-01-01 00:00:01")),
      SeqMsg("p1", 2L, "b", ts("2024-01-01 00:00:02")),
      SeqMsg("p2", 1L, "x", ts("2024-01-01 00:00:03")))
    q.processAllAvailable()
    in.addData(SeqMsg("p1", 2L, "b-dup", ts("2024-01-01 00:00:04")))
    q.processAllAvailable()
    val rows = spark.table(name).count()
    q.stop()
    assert(rows == 3)
  }

  test("stateful ops run on the RocksDB state store (production state path)") {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[KeyedMsg]
      val (q, name) = runToMemory(
        StatefulOps.tableViewStream(in.toDS()).toDF(), "update")
      in.addData(KeyedMsg("k1", "v1", 0L, ts("2024-01-01 00:00:00")))
      q.processAllAvailable()
      in.addData(KeyedMsg("k1", "v2", 5L, ts("2024-01-01 00:00:01")))
      q.processAllAvailable()
      val latest = spark.table(name).as[KeyUpdate].collect().maxBy(_.offset)
      q.stop()
      assert(latest.value == "v2") // state survived across batches in RocksDB
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("wordCount matches WordCountFunction semantics") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val counts = StatefulOps.wordCount(in.toDF(), "value")
    val (q, name) = runToMemory(counts, "complete")
    in.addData("hello world", "hello graft")
    q.processAllAvailable()
    val m = spark.table(name).as[(String, Long)].collect().toMap
    q.stop()
    assert(m == Map("hello" -> 2L, "world" -> 1L, "graft" -> 1L))
  }
}
