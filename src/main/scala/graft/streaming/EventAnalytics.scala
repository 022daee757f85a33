package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** One event on the analytics stream (timestamps in MICROSECONDS — ms
  * granularity can collapse distinct instants and flip the funnel's
  * strict-after comparisons). */
case class UserEvent(user_id: Long, event_type: String, ts_us: Long)

/** A user's funnel progress: first view, first click strictly after it,
  * first purchase strictly after that (the batch `q_funnel` definition). */
case class FunnelProgress(user_id: Long, t1: Option[Long],
                          t2: Option[Long], t3: Option[Long])

/** A (day, user) contribution to the rolling-active count. */
case class DayUser(day: Long, user_id: Long)

/** One user's first activity at a (cohort-week, week-offset) cell. */
case class CohortCell(cohort_wk: Long, week_offset: Long, user_id: Long)

/** Per-user cohort state: signup week (None until the signup event
  * arrives), activity weeks seen BEFORE signup (buffered — a same-week
  * activity that precedes the signup event still counts in the batch
  * definition), and offsets already emitted. */
case class CohortState(cohortWk: Option[Long], preSignupWeeks: Array[Long],
                       emitted: Array[Long])

/** One rank row of an hour's current top-k event types. */
case class TrendingRank(wstart_ms: Long, rk: Int, event_type: String,
                        n: Long)

/** Streaming faces of the event-analytics battery — the batch queries
  * (`q_funnel`, `q_rolling_active`) as incremental keyed state machines,
  * the same incremental/batch duality every persisted index in this repo
  * has.
  *
  * '''Ordering contract.''' Both operators assume per-key in-order
  * delivery across micro-batches — the reference's Key_Shared guarantee
  * (same-key messages reach one consumer in order) that the topic source
  * honors; events WITHIN a batch are sorted before folding, so any
  * intra-batch shuffle disorder is absorbed. An event arriving out of
  * order across batches is LATE in the
  * WindowFunctionExecutor sense (pulsar-functions/instance/.../windowing/
  * WindowFunctionExecutor.java:109-118: tuples behind the watermark are
  * dropped or routed, never retro-processed) — route it through
  * [[LateDataRouter]] upstream; these state machines never rewind.
  *
  * '''Scale shape.''' State is user-keyed and bounded: the funnel stores
  * three optional timestamps per user; rolling-active stores at most
  * `window` contributed days per active day per user. Both shard across
  * executors on the user key in the state store — the per-key sharding
  * Key_Shared dispatch gives the reference.
  *
  * '''Key-population eviction.''' Per-key state is provably bounded, but
  * without eviction the KEY population grows with lifetime distinct users
  * — a departed user's funnel row would live forever. Passing an
  * [[EventAnalytics.Eviction]] policy wires `EventTimeTimeout`: the input
  * is watermarked (`max event time − watermarkLagMs`), every state row
  * arms a timeout at `last event time + horizonMs`, and a key silent past
  * the horizon is REMOVED from the state store when the watermark passes
  * it. The watermark also makes Spark drop late input rows before the
  * stateful operator, so a post-eviction event cannot resurrect a zombie
  * key with empty state and quietly recompute wrong answers — compose
  * with [[LateDataRouter]] upstream to capture that late slice as a side
  * output instead of a silent drop (the WindowFunctionExecutor
  * drop-or-route contract, pulsar-functions/instance/.../windowing/
  * WindowFunctionExecutor.java:109-118). Policy `None` keeps the
  * unbounded-replay face the batch-parity fixtures use.
  *
  * Under a policy the state self-prunes (dedup sets, pre-signup buffers)
  * against the WATERMARK, not the batch max event time: the policy
  * explicitly admits events out of order up to `watermarkLagMs`, and a
  * late-but-on-time event must still find the state that keeps its
  * emission exactly-once/complete. Without a policy the prunes use the
  * batch max, valid under the in-order contract above. */
object EventAnalytics {

  /** Eviction policy: watermark lag (how far out-of-order on-time events
    * may be) and the silence horizon after which a key's state is dropped.
    * Both in milliseconds of EVENT time. */
  final case class Eviction(watermarkLagMs: Long, horizonMs: Long) {
    require(watermarkLagMs >= 0, s"bad watermark lag $watermarkLagMs")
    require(horizonMs > 0, s"bad horizon $horizonMs")
  }

  /** Watermark the event stream for an eviction policy (the event-time
    * column is derived from `ts_us`; extra columns are invisible to the
    * typed operators but the watermark rides the plan into the stateful
    * exec, arming timeouts and late-row filtering). */
  private def watermarked(ds: Dataset[UserEvent], e: Eviction)
  : Dataset[UserEvent] = {
    import ds.sparkSession.implicits._
    ds.withColumn("__et", timestamp_micros(col("ts_us")))
      .withWatermark("__et", s"${e.watermarkLagMs} milliseconds")
      .as[UserEvent]
  }

  private def timeoutConf(evict: Option[Eviction]): GroupStateTimeout =
    if (evict.isDefined) GroupStateTimeout.EventTimeTimeout
    else GroupStateTimeout.NoTimeout

  /** Arm the key's eviction timeout at `lastEventMs + horizon`, clamped
    * above the current watermark (Spark rejects a timeout at or below
    * it — a key whose last event already trails the watermark by more
    * than the horizon evicts at the next watermark advance). */
  private def armTimeout(state: org.apache.spark.sql.streaming.GroupState[_],
                         e: Eviction, lastEventMs: Long): Unit =
    state.setTimeoutTimestamp(
      math.max(state.getCurrentWatermarkMs() + 1, lastEventMs + e.horizonMs))

  /** A lower bound (µs of event time) on any FUTURE event this key can
    * still receive — the floor the state self-prunes against. Without an
    * eviction policy the per-key in-order contract makes this batch's max
    * a valid bound; WITH one, arrival may be out of order by up to the
    * watermark lag, so the batch max over-prunes (a late-but-on-time
    * event below it would find its dedup/buffer state gone) and the only
    * safe bound is the watermark itself — the stateful exec drops rows
    * behind the watermark before they reach the fold, so nothing below it
    * is ever re-processed. */
  private def futureFloorUs(evict: Option[Eviction],
      state: org.apache.spark.sql.streaming.GroupState[_],
      batchMaxUs: Long): Long =
    if (evict.isDefined) state.getCurrentWatermarkMs() * 1000L
    else batchMaxUs

  /** Streaming funnel: per-user first-qualifying-event state, emitted in
    * Update mode whenever a user's progress advances. The latest row per
    * user equals the batch fold; [[funnelCounts]] rolls the table up to
    * `q_funnel`'s one-row report. */
  def funnelProgress(ds: Dataset[UserEvent],
                     evict: Option[Eviction] = None)
  : Dataset[FunnelProgress] = {
    import ds.sparkSession.implicits._
    evict.map(watermarked(ds, _)).getOrElse(ds).groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelProgress, FunnelProgress](
        OutputMode.Update, timeoutConf(evict)) {
        (user, evs, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prev = state.getOption.getOrElse(
              FunnelProgress(user, None, None, None))
            var (t1, t2, t3) = (prev.t1, prev.t2, prev.t3)
            var lastUs = Long.MinValue
            // value-based conditions make same-ts order irrelevant; the
            // sort only guarantees the FIRST qualifying event is the MIN
            evs.toSeq.sortBy(_.ts_us).foreach { e =>
              lastUs = math.max(lastUs, e.ts_us)
              e.event_type match {
                case "view" if t1.isEmpty => t1 = Some(e.ts_us)
                case "click" if t1.exists(e.ts_us > _) && t2.isEmpty =>
                  t2 = Some(e.ts_us)
                case "purchase" if t2.exists(e.ts_us > _) && t3.isEmpty =>
                  t3 = Some(e.ts_us)
                case _ => ()
              }
            }
            val cur = FunnelProgress(user, t1, t2, t3)
            val advanced = cur != prev
            // an eviction policy arms a timeout on EVERY state row, so
            // the row must exist even when this batch made no progress
            if (advanced || evict.isDefined) state.update(cur)
            evict.foreach(armTimeout(state, _, lastUs / 1000L))
            if (advanced) Iterator.single(cur)
            else Iterator.empty // no progress → no emission
          }
      }
  }

  /** The one-row conversion report over the (latest-per-user) progress
    * table — the same column names as `q_funnel`, so replay parity is a
    * frame compare. */
  def funnelCounts(progress: DataFrame): DataFrame =
    progress.agg(
      sum(when(col("t1").isNotNull, 1L).otherwise(0L)).as("n_view"),
      sum(when(col("t2").isNotNull, 1L).otherwise(0L)).as("n_click_after"),
      sum(when(col("t3").isNotNull, 1L).otherwise(0L)).as("n_purchase_after"))

  /** Streaming rolling-active: per-user day-bucket distinct state. An
    * activity on day `a` makes the user count toward every window day in
    * [a, a+window−1]; each NEW (window-day, user) contribution is emitted
    * exactly once (Append mode — contributions never retract), so a
    * downstream per-day count over the emitted pairs equals
    * `q_rolling_active`'s trailing-window distinct count. State per user =
    * the contributed-day set (≤ window × active-days, horizon-evictable). */
  def rollingActiveIncrements(ds: Dataset[UserEvent], window: Int = 7,
                              evict: Option[Eviction] = None)
  : Dataset[DayUser] = {
    require(window >= 1 && window <= 370, s"bad window $window")
    // horizon-vs-window coupling, enforced not documented: a key evicted
    // after `horizonMs` of silence loses its contributed-day dedup state.
    // A returning on-time event's time exceeds lastEvent + horizon, so its
    // window days start ≥ lastDay + horizon-in-days — with the horizon at
    // least the window, those days are disjoint from every previously
    // contributed day and Append-mode (day, user) pairs stay exactly-once;
    // with a shorter horizon a return inside an old window would re-emit
    // already-contributed pairs.
    evict.foreach(e => require(e.horizonMs >= window * 86400000L,
      s"eviction horizon ${e.horizonMs} ms < window $window days: a key " +
        "evicted mid-window could re-emit contributed (day, user) pairs " +
        "on return — widen the horizon to at least the window"))
    import ds.sparkSession.implicits._
    evict.map(watermarked(ds, _)).getOrElse(ds).groupByKey(_.user_id)
      .flatMapGroupsWithState[Array[Long], DayUser](
        OutputMode.Append, timeoutConf(evict)) {
        (user, evs, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var contributed =
              state.getOption.getOrElse(Array.empty[Long]).toSet
            val out = Seq.newBuilder[DayUser]
            val seq = evs.toSeq
            val lastUs =
              if (seq.isEmpty) Long.MinValue else seq.map(_.ts_us).max
            seq.map(e => Math.floorDiv(e.ts_us, 86400000000L))
              .distinct.sorted.foreach { a =>
                val fresh = (a until a + window).filterNot(contributed)
                fresh.foreach(d => out += DayUser(d, user))
                contributed ++= fresh
              }
            // state self-pruning: every FUTURE activity day a' is at least
            // the future floor F (in-order contract without eviction; the
            // watermark with one), so its contributions land in
            // [a', a'+window) ⊆ [F, ∞) — contributed days below F are
            // never re-checked and safe to drop. Per-user state is thereby
            // O(window + watermark lag in days), not O(lifetime).
            val floorUs = futureFloorUs(evict, state, lastUs)
            if (floorUs > Long.MinValue) {
              val floorDay = Math.floorDiv(floorUs, 86400000000L)
              contributed = contributed.filter(_ >= floorDay)
            }
            state.update(contributed.toArray.sorted)
            evict.foreach(armTimeout(state, _, lastUs / 1000L))
            out.result().iterator
          }
      }
  }

  /** Per-day rolling actives from the emitted increments, restricted to
    * days that saw any activity (the batch query's observed day grid).
    * Column names match `q_rolling_active` (d, wau). */
  def wau(increments: DataFrame, activeDays: DataFrame): DataFrame =
    increments.groupBy(col("day")).agg(count(lit(1)).as("wau"))
      .join(activeDays.select(col("d")), col("day") === col("d"))
      .select(col("d"), col("wau"))

  /** Streaming cohort retention: emits each user's FIRST activity in every
    * (cohort-week, week-offset) cell exactly once (Append — cells never
    * retract); a downstream count per cell equals `q_cohort_retention`.
    *
    * The batch definition cohorts a user by their first `signup` event's
    * week and counts non-signup activity at `act_wk ≥ cohort_wk` — which
    * includes same-week activity whose TIMESTAMP precedes the signup
    * event. In-order streaming would drop those (no cohort assigned yet),
    * so pre-signup activity weeks are BUFFERED in state and replayed the
    * moment the signup lands; users who never sign up hold only that
    * bounded week set. */
  def cohortIncrements(ds: Dataset[UserEvent],
                       evict: Option[Eviction] = None)
  : Dataset[CohortCell] = {
    import ds.sparkSession.implicits._
    val usPerWeek = 86400000000L * 7L
    evict.map(watermarked(ds, _)).getOrElse(ds).groupByKey(_.user_id)
      .flatMapGroupsWithState[CohortState, CohortCell](
        OutputMode.Append, timeoutConf(evict)) {
        (user, evs, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val st = state.getOption.getOrElse(
              CohortState(None, Array.empty, Array.empty))
            var cohort = st.cohortWk
            var pre = st.preSignupWeeks.toSet
            var emitted = st.emitted.toSet
            val out = Seq.newBuilder[CohortCell]
            def emit(actWk: Long): Unit = cohort.foreach { cw =>
              val off = actWk - cw
              if (off >= 0 && !emitted(off)) {
                emitted += off; out += CohortCell(cw, off, user)
              }
            }
            var lastUs = Long.MinValue
            evs.toSeq.sortBy(_.ts_us).foreach { e =>
              val wk = Math.floorDiv(e.ts_us, usPerWeek)
              lastUs = math.max(lastUs, e.ts_us)
              if (e.event_type == "signup") {
                if (cohort.isEmpty) {
                  cohort = Some(wk)
                  pre.foreach(emit); pre = Set.empty
                }
              } else if (cohort.isEmpty) pre += wk
              else emit(wk)
            }
            // state self-pruning (the rolling-active discipline): future
            // activity weeks are ≥ the future-floor week F, so emitted
            // offsets below (F − cohort) can never be generated again —
            // the emitted set stays O(1), not O(user lifetime in weeks).
            // The same argument prunes the never-signed-up buffer: a
            // future signup's cohort week is ≥ F, so buffered weeks
            // strictly below F could only produce negative offsets — dead
            // weight. Pruning against the batch max instead of F would
            // break under an eviction policy: a signup arriving late but
            // on-time (its week below weeks already seen, within the
            // watermark lag) must still find its same-week pre-signup
            // buffer to emit the offset-0 cell.
            val floorUs = futureFloorUs(evict, state, lastUs)
            if (floorUs > Long.MinValue) {
              val floorWk = Math.floorDiv(floorUs, usPerWeek)
              cohort match {
                case Some(cw) => emitted = emitted.filter(_ >= floorWk - cw)
                case None => pre = pre.filter(_ >= floorWk)
              }
            }
            state.update(CohortState(cohort, pre.toArray.sorted,
              emitted.toArray.sorted))
            evict.foreach(armTimeout(state, _, lastUs / 1000L))
            out.result().iterator
          }
      }
  }

  /** The retention matrix from the emitted cells — column names match
    * `q_cohort_retention` (cohort_wk, week_offset, n_active). */
  def retentionMatrix(cells: DataFrame): DataFrame =
    cells.groupBy(col("cohort_wk"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))

  /** Streaming hourly trending top-k: state per tumbling hour = the
    * per-type count map (bounded by event-type cardinality), re-emitting
    * that hour's CURRENT top-k whenever a batch touches it (Update mode —
    * latest emission per (window, rank) is the answer, `q_trending`'s
    * (n desc, type asc) ordering). With an [[Eviction]] policy, an hour
    * whose last event trails the watermark by the horizon is dropped from
    * the state store — closed hours stop paying state rent. */
  def trendingTop(ds: Dataset[UserEvent], k: Int = 3,
                  evict: Option[Eviction] = None)
  : Dataset[TrendingRank] = {
    require(k >= 1 && k <= 100, s"bad k $k")
    import ds.sparkSession.implicits._
    evict.map(watermarked(ds, _)).getOrElse(ds)
      .groupByKey(e => Math.floorDiv(e.ts_us, 3600000000L))
      .flatMapGroupsWithState[Map[String, Long], TrendingRank](
        OutputMode.Update, timeoutConf(evict)) {
        (hour, evs, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var counts = state.getOption.getOrElse(Map.empty[String, Long])
            var lastUs = Long.MinValue
            evs.foreach { e =>
              lastUs = math.max(lastUs, e.ts_us)
              counts = counts.updated(e.event_type,
                counts.getOrElse(e.event_type, 0L) + 1L)
            }
            state.update(counts)
            evict.foreach(armTimeout(state, _, lastUs / 1000L))
            counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(k)
              .zipWithIndex.iterator.map { case ((t, n), i) =>
                TrendingRank(hour * 3600000L, i + 1, t, n)
              }
          }
      }
  }
}
