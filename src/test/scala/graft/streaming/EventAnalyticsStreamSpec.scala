package graft.streaming

import java.nio.file.Files

import graft.SparkSuite
import graft.queries.StreamingSemanticsQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming faces of the event-analytics battery replay the REAL events
  * table (in per-user ts order, arbitrary micro-batch boundaries) and must
  * land exactly on the batch queries' answers. */
class EventAnalyticsStreamSpec extends SparkSuite {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  // the whole events table in global ts order (⇒ per-user in-order, the
  // Key_Shared delivery contract), as micros
  private def orderedEvents: Seq[UserEvent] =
    graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .orderBy(col("ts"), col("event_id"))
      .as[(Long, String, Long)].collect().toSeq
      .map { case (u, e, t) => UserEvent(u, e, t) }

  private def replay[T](evs: Seq[UserEvent], nBatches: Int,
                        mode: String = "update")(
      wire: org.apache.spark.sql.Dataset[UserEvent] => org.apache.spark.sql.DataFrame)
  : org.apache.spark.sql.DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[UserEvent]
    val out = Files.createTempDirectory("ea-out").toFile.getAbsolutePath
    val cp = Files.createTempDirectory("ea-cp").toFile.getAbsolutePath
    val q = wire(source.toDS())
      .writeStream.outputMode(mode)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        b.withColumn("__batch", lit(id)).write.mode("append").parquet(out)
      }
      .option("checkpointLocation", cp)
      .start()
    val size = math.max(1, evs.size / nBatches)
    evs.grouped(size).foreach { chunk =>
      source.addData(chunk: _*); q.processAllAvailable()
    }
    q.stop()
    spark.read.parquet(out)
  }

  test("streamed funnel equals q_funnel on ordered replay") {
    val updates = replay(orderedEvents, nBatches = 5)(ds =>
      EventAnalytics.funnelProgress(ds).toDF())
    // latest emission per user = final state (≤ one row per user per batch)
    val latest = updates
      .groupBy(col("user_id"))
      .agg(max_by(struct(col("t1"), col("t2"), col("t3")), col("__batch"))
        .as("p"))
      .select(col("user_id"), col("p.t1").as("t1"), col("p.t2").as("t2"),
        col("p.t3").as("t3"))
    val got = EventAnalytics.funnelCounts(latest)
      .as[(Long, Long, Long)].collect().head
    val want = StreamingSemanticsQueries.queries("q_funnel")(spark, sfDir)
      .as[(Long, Long, Long)].collect().head
    assert(got == want, s"streamed $got vs batch $want")
    assert(want._1 > 0, "fixture has views — the parity is not vacuous")
  }

  test("streamed rolling-active increments equal q_rolling_active") {
    val incs = replay(orderedEvents, nBatches = 4, mode = "append")(ds =>
      EventAnalytics.rollingActiveIncrements(ds, window = 7).toDF())
    // increments are append-once: re-emission of a (day, user) pair would
    // double-count — assert uniqueness before the rollup
    assert(incs.groupBy("day", "user_id").count().where(col("count") > 1)
      .isEmpty, "a (day,user) contribution must be emitted exactly once")
    val activeDays = graft.core.Tables.events(spark, sfDir)
      .select(expr("unix_millis(ts) div 86400000").as("d")).distinct()
    val got = EventAnalytics.wau(incs, activeDays)
      .orderBy("d").as[(Long, Long)].collect().toSeq
    val want = StreamingSemanticsQueries
      .queries("q_rolling_active")(spark, sfDir)
      .as[(Long, Long)].collect().toSeq
    assert(got == want, s"streamed $got vs batch $want")
    assert(want.nonEmpty)
  }

  test("streamed cohort cells equal q_cohort_retention") {
    val cells = replay(orderedEvents, nBatches = 5, mode = "append")(ds =>
      EventAnalytics.cohortIncrements(ds).toDF())
    assert(cells.groupBy("cohort_wk", "week_offset", "user_id").count()
      .where(col("count") > 1).isEmpty, "cells are append-once")
    val got = EventAnalytics.retentionMatrix(cells)
      .orderBy("cohort_wk", "week_offset")
      .as[(Long, Long, Long)].collect().toSeq
    val want = StreamingSemanticsQueries
      .queries("q_cohort_retention")(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == want, s"streamed ${got.take(5)}… vs batch ${want.take(5)}…")
    assert(want.nonEmpty)
  }

  test("same-week activity BEFORE the signup event still lands in week 0") {
    // week = floor(us / 7 days); plant activity then signup inside one
    // week, delivered in separate batches — the buffered-replay path
    val wk = 86400000000L * 7L
    val evs = Seq(
      UserEvent(1L, "view", 40L * wk + 100L),
      UserEvent(1L, "signup", 40L * wk + 200L),
      UserEvent(1L, "click", 41L * wk + 5L))
    val cells = replay(evs, nBatches = 3, mode = "append")(ds =>
      EventAnalytics.cohortIncrements(ds).toDF())
      .select("cohort_wk", "week_offset", "user_id")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(cells == Seq((40L, 0L, 1L), (40L, 1L, 1L)),
      "the pre-signup same-week view counts at offset 0, like the batch join")
  }

  test("streamed trending top-3 equals q_trending") {
    val ranks = replay(orderedEvents, nBatches = 6)(ds =>
      EventAnalytics.trendingTop(ds, k = 3).toDF())
    // latest emission per (window, rank) = the hour's final top-3
    val latest = ranks.groupBy(col("wstart_ms"), col("rk"))
      .agg(max_by(struct(col("event_type"), col("n")), col("__batch"))
        .as("p"))
      .select(col("wstart_ms"), col("p.event_type").as("event_type"),
        col("p.n").as("n"), col("rk"))
    val got = latest.orderBy("wstart_ms", "rk")
      .as[(Long, String, Long, Int)].collect().toSeq
      .map { case (w, t, n, r) => (w, t, n, r.toLong) }
    val want = StreamingSemanticsQueries.queries("q_trending")(spark, sfDir)
      .select(col("wstart_ms"), col("event_type"), col("n"), col("rk"))
      .as[(Long, String, Long, Int)].collect().toSeq
      .map { case (w, t, n, r) => (w, t, n, r.toLong) }
    assert(got == want, s"streamed ${got.take(4)}… vs batch ${want.take(4)}…")
    assert(want.nonEmpty)
  }

  test("state self-pruning: a long-lived user still emits each cell once") {
    // 100 consecutive active days across 10 batches — with pruning the
    // contributed-day state stays O(window); a pruning bug shows up as a
    // duplicate (re-emitted after drop) or a hole (over-pruned)
    val day = 86400000000L
    val evs = (0 until 100).map(i => UserEvent(1L, "view", 500L * day + i * day))
    val incs = replay(evs, nBatches = 10, mode = "append")(ds =>
      EventAnalytics.rollingActiveIncrements(ds, window = 7).toDF())
      .select("day").as[Long].collect().toSeq.sorted
    assert(incs == (500L until 606L).toList,
      "every window day from first activity to last+6, exactly once")

    // 60 weekly activities after a signup — emitted-offset state prunes
    // to O(1) while the cells stay append-once
    val wk = day * 7
    val cEvs = UserEvent(2L, "signup", 40L * wk) +:
      (0 until 60).map(i => UserEvent(2L, "click", 40L * wk + i * wk + 1000L))
    val cells = replay(cEvs, nBatches = 12, mode = "append")(ds =>
      EventAnalytics.cohortIncrements(ds).toDF())
      .select("week_offset").as[Long].collect().toSeq.sorted
    assert(cells == (0L until 60L).toList)
  }

  test("batch boundaries are irrelevant: 1 batch equals many") {
    val evs = orderedEvents.take(400)
    def counts(n: Int) = {
      val updates = replay(evs, nBatches = n)(ds =>
        EventAnalytics.funnelProgress(ds).toDF())
      val latest = updates.groupBy(col("user_id"))
        .agg(max_by(struct(col("t1"), col("t2"), col("t3")), col("__batch"))
          .as("p"))
        .select(col("p.t1").as("t1"), col("p.t2").as("t2"),
          col("p.t3").as("t3"))
      EventAnalytics.funnelCounts(latest)
        .as[(Long, Long, Long)].collect().head
    }
    assert(counts(1) == counts(7))
  }
}
