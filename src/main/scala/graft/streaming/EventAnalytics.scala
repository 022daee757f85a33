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
  * `window` contributed days per active day per user, with days older
  * than the horizon evictable on watermark timeout. Both shard across
  * executors on the user key in the state store — the per-key sharding
  * Key_Shared dispatch gives the reference. */
object EventAnalytics {

  /** Streaming funnel: per-user first-qualifying-event state, emitted in
    * Update mode whenever a user's progress advances. The latest row per
    * user equals the batch fold; [[funnelCounts]] rolls the table up to
    * `q_funnel`'s one-row report. */
  def funnelProgress(ds: Dataset[UserEvent]): Dataset[FunnelProgress] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelProgress, FunnelProgress](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user, evs, state) =>
          val prev = state.getOption.getOrElse(
            FunnelProgress(user, None, None, None))
          var (t1, t2, t3) = (prev.t1, prev.t2, prev.t3)
          // value-based conditions make same-ts order irrelevant; the sort
          // only guarantees the FIRST qualifying event is the MIN one
          evs.toSeq.sortBy(_.ts_us).foreach { e =>
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
          if (cur != prev) { state.update(cur); Iterator.single(cur) }
          else Iterator.empty // no progress → no emission
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
  def rollingActiveIncrements(ds: Dataset[UserEvent], window: Int = 7)
  : Dataset[DayUser] = {
    require(window >= 1 && window <= 370, s"bad window $window")
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[Array[Long], DayUser](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user, evs, state) =>
          var contributed = state.getOption.getOrElse(Array.empty[Long]).toSet
          val out = Seq.newBuilder[DayUser]
          var last = Long.MinValue
          evs.map(e => Math.floorDiv(e.ts_us, 86400000000L))
            .toSeq.distinct.sorted.foreach { a =>
              val fresh = (a until a + window).filterNot(contributed)
              fresh.foreach(d => out += DayUser(d, user))
              contributed ++= fresh
              last = a
            }
          // state self-pruning: in-order arrival means every FUTURE
          // activity day a' ≥ last, so its contributions land in
          // [a', a'+window) ⊆ [last, ∞) — contributed days below `last`
          // are unreachable and safe to drop. Per-user state is thereby
          // O(window) forever, not O(lifetime active days).
          if (last > Long.MinValue)
            contributed = contributed.filter(_ >= last)
          state.update(contributed.toArray.sorted)
          out.result().iterator
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
  def cohortIncrements(ds: Dataset[UserEvent]): Dataset[CohortCell] = {
    import ds.sparkSession.implicits._
    val usPerWeek = 86400000000L * 7L
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[CohortState, CohortCell](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user, evs, state) =>
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
          var lastWk = Long.MinValue
          evs.toSeq.sortBy(_.ts_us).foreach { e =>
            val wk = Math.floorDiv(e.ts_us, usPerWeek)
            lastWk = math.max(lastWk, wk)
            if (e.event_type == "signup") {
              if (cohort.isEmpty) {
                cohort = Some(wk)
                pre.foreach(emit); pre = Set.empty
              }
            } else if (cohort.isEmpty) pre += wk
            else emit(wk)
          }
          // state self-pruning (the rolling-active discipline): in-order
          // arrival means future activity weeks are ≥ lastWk, so emitted
          // offsets below (lastWk − cohort) can never be generated again —
          // the emitted set stays O(1), not O(user lifetime in weeks).
          if (lastWk > Long.MinValue) cohort.foreach { cw =>
            emitted = emitted.filter(_ >= lastWk - cw)
          }
          state.update(CohortState(cohort, pre.toArray.sorted,
            emitted.toArray.sorted))
          out.result().iterator
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
    * (n desc, type asc) ordering). Hours older than the watermark horizon
    * would be evicted via state timeout in a deployment; the fixture
    * replay keeps them all. */
  def trendingTop(ds: Dataset[UserEvent], k: Int = 3)
  : Dataset[TrendingRank] = {
    require(k >= 1 && k <= 100, s"bad k $k")
    import ds.sparkSession.implicits._
    ds.groupByKey(e => Math.floorDiv(e.ts_us, 3600000000L))
      .flatMapGroupsWithState[Map[String, Long], TrendingRank](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (hour, evs, state) =>
          var counts = state.getOption.getOrElse(Map.empty[String, Long])
          evs.foreach { e =>
            counts = counts.updated(e.event_type,
              counts.getOrElse(e.event_type, 0L) + 1L)
          }
          state.update(counts)
          counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(k)
            .zipWithIndex.iterator.map { case ((t, n), i) =>
              TrendingRank(hour * 3600000L, i + 1, t, n)
            }
      }
  }
}
