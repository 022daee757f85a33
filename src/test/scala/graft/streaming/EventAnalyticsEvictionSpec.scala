package graft.streaming

import java.nio.file.Files

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[EventAnalytics.Eviction]] — the key-population bound. Per-key state
  * was already proven O(window); these cases prove the POPULATION is too:
  * (a) a key silent past the horizon leaves the state store (read back via
  * the `statestore` source from the checkpoint), (b) the emitted output
  * keeps batch parity on the on-time subset, (c) a late/post-eviction
  * event is routed to [[LateDataRouter]]'s side output and — even if fed
  * to the machine anyway — is dropped by the watermark instead of
  * resurrecting a zombie key with empty state (the WindowFunctionExecutor
  * drop-or-route contract, WindowFunctionExecutor.java:109-118). */
class EventAnalyticsEvictionSpec extends SparkSuite {
  import spark.implicits._

  private def s2us(s: Long) = s * 1000000L

  /** Drive `wire` over per-batch event groups; returns (output rows with
    * __batch, checkpoint dir) so state can be read back after stop. */
  private def replayBatches(batches: Seq[Seq[UserEvent]], mode: String)(
      wire: org.apache.spark.sql.Dataset[UserEvent] => org.apache.spark.sql.DataFrame)
  : (org.apache.spark.sql.DataFrame, String) = {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[UserEvent]
    val out = Files.createTempDirectory("eav-out").toFile.getAbsolutePath
    val cp = Files.createTempDirectory("eav-cp").toFile.getAbsolutePath
    val q = wire(source.toDS())
      .writeStream.outputMode(mode)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        b.withColumn("__batch", lit(id)).write.mode("append").parquet(out)
      }
      .option("checkpointLocation", cp)
      .start()
    batches.foreach { chunk =>
      source.addData(chunk: _*); q.processAllAvailable()
    }
    q.stop()
    (spark.read.parquet(out), cp)
  }

  /** Grouping keys currently in the state store at the given checkpoint. */
  private def stateKeys(cp: String): Set[Long] =
    spark.read.format("statestore").load(cp)
      .select("key.*").collect().map(_.getLong(0)).toSet

  private val policy =
    EventAnalytics.Eviction(watermarkLagMs = 1000L, horizonMs = 3600000L)

  test("funnel: silent key evicts, on-time parity holds, late rows drop") {
    // u1 goes silent after 1000s; u2 keeps the watermark moving. u1's
    // timeout arms at 1000s + 1h; the watermark passes it after b2, so b3
    // evicts u1. b4 is a LATE event for the evicted key (1500s, far
    // behind the ~9099s watermark) — it must NOT resurrect u1.
    val b1 = Seq(UserEvent(1L, "view", s2us(1000)),
      UserEvent(2L, "view", s2us(1000)))
    val b2 = Seq(UserEvent(2L, "click", s2us(9000)))
    val b3 = Seq(UserEvent(2L, "purchase", s2us(9100)))
    val b4 = Seq(UserEvent(1L, "click", s2us(1500))) // late, post-eviction
    val (outDf, cp) = replayBatches(Seq(b1, b2, b3, b4), "update")(ds =>
      EventAnalytics.funnelProgress(ds, evict = Some(policy)).toDF())

    // (a) the silent key left the state store; the live key remains
    assert(stateKeys(cp) == Set(2L),
      s"u1 must be evicted and u2 retained, got ${stateKeys(cp)}")

    // (c) the late event produced no emission (no zombie restart row)
    val lateBatch = outDf.where(col("__batch") === 3L)
    assert(lateBatch.isEmpty,
      "a late event for an evicted key must be dropped, not re-processed")

    // (b) latest-per-user output equals the batch fold over the ON-TIME
    // subset: u1 view-only (emitted before eviction), u2 full funnel
    val latest = outDf.groupBy(col("user_id"))
      .agg(max_by(struct(col("t1"), col("t2"), col("t3")), col("__batch"))
        .as("p"))
      .select(col("user_id"), col("p.t1").as("t1"), col("p.t2").as("t2"),
        col("p.t3").as("t3"))
    val got = EventAnalytics.funnelCounts(latest)
      .as[(Long, Long, Long)].collect().head
    assert(got == ((2L, 1L, 1L)),
      s"on-time parity: 2 views, 1 click-after, 1 purchase-after; got $got")
  }

  test("router composition: the late slice lands in the side output") {
    // the same timeline driven through a LateDataRouter upstream of the
    // machine — the b4 late row goes to the side output, the machine only
    // ever sees on-time rows
    val router = new LateDataRouter("__et", lagMs = 1000L)
    val batches = Seq(
      Seq((1L, "view", s2us(1000)), (2L, "view", s2us(1000))),
      Seq((2L, "click", s2us(9000))),
      Seq((2L, "purchase", s2us(9100))),
      Seq((1L, "click", s2us(1500))))
    var late = Vector.empty[(Long, String, Long)]
    var onTime = Vector.empty[UserEvent]
    batches.foreach { chunk =>
      val df = chunk.toDF("user_id", "event_type", "ts_us")
        .withColumn("__et", timestamp_micros(col("ts_us")))
      val (ok, lateDf) = router.split(df)
      late ++= lateDf.select("user_id", "event_type", "ts_us")
        .as[(Long, String, Long)].collect()
      onTime ++= ok.select("user_id", "event_type", "ts_us")
        .as[(Long, String, Long)].collect()
        .map { case (u, e, t) => UserEvent(u, e, t) }
    }
    assert(late == Vector((1L, "click", s2us(1500))),
      s"exactly the post-eviction row routes late, got $late")
    assert(onTime.size == 4, "the four on-time rows flow on")
  }

  test("rolling-active: silent key evicts; survivor state stays pruned") {
    val day = 86400000000L
    // the operator ENFORCES horizon ≥ window (an earlier eviction would
    // lose the contributed-day dedup state and re-emit pairs on return)
    val rollPolicy =
      EventAnalytics.Eviction(watermarkLagMs = 1000L,
        horizonMs = 7L * 86400000L)
    val b1 = Seq(UserEvent(1L, "view", 100L * day),
      UserEvent(2L, "view", 100L * day))
    // u2 stays active; u1's timeout arms at day 107 — the day-110 batch
    // moves the watermark past it and the next batch evicts u1
    val b2 = Seq(UserEvent(2L, "view", 103L * day))
    val b3 = Seq(UserEvent(2L, "view", 110L * day))
    val b4 = Seq(UserEvent(2L, "view", 111L * day))
    val (outDf, cp) = replayBatches(Seq(b1, b2, b3, b4), "append")(ds =>
      EventAnalytics.rollingActiveIncrements(ds, window = 7,
        evict = Some(rollPolicy)).toDF())
    assert(stateKeys(cp) == Set(2L), s"got ${stateKeys(cp)}")
    // increments emitted BEFORE eviction are retained downstream: u1
    // contributed its 7 window days from day 100 exactly once
    val u1Days = outDf.where(col("user_id") === 1L)
      .select("day").as[Long].collect().toSeq.sorted
    assert(u1Days == (100L until 107L).toList, s"got $u1Days")
  }

  test("rolling-active: horizon shorter than the window is rejected") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[UserEvent]
    val bad = EventAnalytics.Eviction(watermarkLagMs = 1000L,
      horizonMs = 3600000L)
    val e = intercept[IllegalArgumentException] {
      EventAnalytics.rollingActiveIncrements(source.toDS(), window = 7,
        evict = Some(bad))
    }
    assert(e.getMessage.contains("horizon"))
  }

  test("rolling-active: late-but-on-time return stays exactly-once") {
    // the eviction policy admits out-of-order arrival up to the lag, so
    // the contributed-day prune must use the WATERMARK, not the batch max
    // — pruning at the batch max would drop day-100's dedup entries when
    // day 110 arrives, and the on-time day-105 return would re-emit them
    val day = 86400000000L
    val p = EventAnalytics.Eviction(watermarkLagMs = 7L * 86400000L,
      horizonMs = 7L * 86400000L)
    val batches = Seq(
      Seq(UserEvent(1L, "view", 100L * day)),
      Seq(UserEvent(1L, "view", 110L * day)),
      // watermark after day 110 = day 103; day 105 is late but ON-time
      Seq(UserEvent(1L, "view", 105L * day)))
    val (outDf, _) = replayBatches(batches, "append")(ds =>
      EventAnalytics.rollingActiveIncrements(ds, window = 7,
        evict = Some(p)).toDF())
    val days = outDf.where(col("user_id") === 1L)
      .select("day").as[Long].collect().toSeq.sorted
    // batch parity: days 100–116 contributed, each EXACTLY once
    assert(days == (100L to 116L).toList, s"got $days")
  }

  test("cohort: a late-but-on-time signup still finds its pre-buffer") {
    // same exposure on the pre-signup buffer: a signup whose week is
    // below weeks already seen (but within the watermark lag) must still
    // emit the offset-0 cell from the buffered same-week activity
    val wk = 86400000000L * 7L
    val p = EventAnalytics.Eviction(watermarkLagMs = 14L * 86400000L,
      horizonMs = 3600000L)
    val batches = Seq(
      Seq(UserEvent(1L, "view", 40L * wk)),
      Seq(UserEvent(1L, "view", 41L * wk)),
      // watermark after week 41 = week 39; the week-40 signup is on-time
      Seq(UserEvent(1L, "signup", 40L * wk + 1000000L)))
    val (outDf, _) = replayBatches(batches, "append")(ds =>
      EventAnalytics.cohortIncrements(ds, evict = Some(p)).toDF())
    val cells = outDf.where(col("user_id") === 1L)
      .select("week_offset").as[Long].collect().toSeq.sorted
    assert(cells == Seq(0L, 1L),
      s"offset-0 (buffered week-40 view) and offset-1 must emit: $cells")
  }

  test("cohort: a never-signed-up user evicts with its buffered weeks") {
    val wk = 86400000000L * 7L
    // u1 browses but never signs up (its pre-signup buffer is pure state
    // rent); u2 signs up and keeps the watermark moving past u1's horizon
    val b1 = Seq(UserEvent(1L, "view", 40L * wk),
      UserEvent(2L, "signup", 40L * wk))
    val b2 = Seq(UserEvent(2L, "click", 41L * wk))
    val b3 = Seq(UserEvent(2L, "click", 41L * wk + 7200000000L))
    val (outDf, cp) = replayBatches(Seq(b1, b2, b3), "append")(ds =>
      EventAnalytics.cohortIncrements(ds, evict = Some(policy)).toDF())
    assert(stateKeys(cp) == Set(2L),
      s"the never-signed-up key must evict: ${stateKeys(cp)}")
    // u2's cell (the week-1 click; the signup itself is not activity)
    // survives in the output history, emitted exactly once
    val cells = outDf.where(col("user_id") === 2L)
      .select("week_offset").as[Long].collect().toSeq.sorted
    assert(cells == Seq(1L))
  }

  test("trending: a closed hour stops paying state rent") {
    val hour = 3600000000L
    val b1 = Seq(UserEvent(1L, "view", 10L * hour + 1L),
      UserEvent(2L, "click", 10L * hour + 2L))
    // events 5 hours on move the watermark past hour 10's horizon
    val b2 = Seq(UserEvent(3L, "view", 15L * hour))
    val b3 = Seq(UserEvent(4L, "view", 15L * hour + 1000000L))
    val (outDf, cp) = replayBatches(Seq(b1, b2, b3), "update")(ds =>
      EventAnalytics.trendingTop(ds, k = 3, evict = Some(policy)).toDF())
    assert(stateKeys(cp) == Set(15L), s"hour 10 must close: ${stateKeys(cp)}")
    // hour 10's final top-k emissions survive in the output history
    val h10 = outDf.where(col("wstart_ms") === 10L * 3600000L)
      .select("event_type").as[String].collect().toSet
    assert(h10 == Set("view", "click"))
  }
}
