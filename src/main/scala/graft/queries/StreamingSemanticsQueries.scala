package graft.queries

import graft.core.Tables
import graft.ops.{Compaction, Dedup, EventOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pulsar-semantics operators (SURVEY §2.4/§2.5/§2.9) in their batch-checkable
  * form: the same `window`/`session_window`/aggregation expressions run
  * unchanged under Structured Streaming (specs in graft.streaming cover the
  * incremental path); here they run over the bounded `events` table so the
  * DuckDB oracle can hash-check them.
  *
  * All raw timestamps are emitted as unix-epoch milliseconds: the testdata
  * stores nanosecond timestamps, Spark truncates to µs and DuckDB keeps ns, so
  * the ms domain is the shared exact representation.
  */
object StreamingSemanticsQueries {
  type Q = (SparkSession, String) => DataFrame

  // 2024-01-15T00:00Z / 2024-01-31T00:00Z in epoch ms.
  private val midMs = 1705276800000L
  private val endMs = 1706659200000L

  val queries: Map[String, Q] = Map(
    // §2.5 tumbling event-time window (WindowConfig.windowLengthDurationMs).
    "q_window_tumbling" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
        .select(unix_millis(col("w.start")).as("wstart_ms"), col("event_type"),
          col("n"), col("total"))
    }),

    // §2.5 sliding window (slidingIntervalDurationMs < windowLength).
    "q_window_sliding" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_millis(col("w.start")).as("wstart_ms"), col("event_type"),
          col("n"))
    }),

    // §2.5 session window (parity-plus: absent in the reference).
    "q_session_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "10 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
        .select(col("user_id"), unix_millis(col("w.start")).as("session_start_ms"),
          col("n"), col("total"))
    }),

    // §2.9 delayed delivery: due-set at a cutoff, in delivery order.
    // deliver_at := ts + (user_id % 60) minutes (synthetic delay column).
    "q_delayed_due" -> ((s, d) => {
      val e = Tables.events(s, d)
        .withColumn("deliver_at_ms",
          unix_millis(col("ts")) + (col("user_id") % 60) * 60000L)
      e.where(EventOps.delayedDue(col("deliver_at_ms"), lit(midMs)))
        .where(unix_millis(col("ts")) > midMs - 7200000L) // due-scan horizon
        .select(col("event_id"), col("user_id"), col("deliver_at_ms"))
    }),

    // §2.9 TTL expiry: keep only messages younger than 7 days at end-of-data.
    "q_ttl_expiry" -> ((s, d) => {
      Tables.events(s, d)
        .where(unix_millis(col("ts")) > endMs - 7L * 86400000L)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_live"), min(unix_millis(col("ts"))).as("oldest_ms"))
    }),

    // §2.9 late-data routing: events older than watermark (max ts − 24h lag).
    "q_late_data" -> ((s, d) => {
      val e = Tables.events(s, d).withColumn("ts_ms", unix_millis(col("ts")))
      val wm = e.agg(max(col("ts_ms")).as("max_ms"))
      e.crossJoin(broadcast(wm))
        .withColumn("is_late", col("ts_ms") < col("max_ms") - 86400000L)
        .groupBy(col("event_type"), col("is_late"))
        .agg(count(lit(1)).as("n"))
    }),

    // §2.4 broker dedup: redelivered (duplicated) stream → exactly one row per
    // (producer, sequence_id). Duplicates injected by unioning a slice back in.
    "q_dedup_seq" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(concat(lit("producer-"), (col("user_id") % 8).cast("string"))
          .as("producer_name"),
          col("event_id").as("sequence_id"), col("event_type"), col("value"))
      val redelivered = e.unionAll(e.where(col("sequence_id") % 7 === 0))
      Dedup.byProducerSeq(redelivered, "producer_name", "sequence_id",
          col("sequence_id"))
        .groupBy(col("producer_name"))
        .agg(count(lit(1)).as("n_unique"), sum(col("value")).as("total_value"))
    }),

    // §2.4 topic compaction: last value per key by offset.
    "q_compact_last" -> ((s, d) => {
      Compaction.compact(Tables.events(s, d), Seq("user_id"), col("event_id"))
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_type"), col("value").as("last_value"))
    }),

    // §2.4 compaction with tombstones: value<10 marks a delete; keys whose
    // final record is a tombstone disappear.
    "q_compact_tombstone" -> ((s, d) => {
      val e = Tables.events(s, d)
        .withColumn("v", when(col("value") < 10.0, lit(null)).otherwise(col("value")))
      Compaction.compactWithTombstones(e, Seq("user_id"), col("event_id"), "v")
        .select(col("user_id"), col("event_id").as("last_event_id"), col("v").as("last_value"))
    }),

    // §2.2 Key_Shared dispatch: the slice consumer 0 of 4 receives (hash-range
    // membership expressed portably as key mod for the oracle; the library's
    // Envelope.keySharedSlice uses murmur3 hash()).
    "q_key_shared" -> ((s, d) => {
      Tables.events(s, d)
        .where(col("user_id") % 4 === 0)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    }),

    // §2.5 tumbling COUNT window (windowLengthCount), batch-checkable form:
    // per key, consecutive groups of 5 events in offset order.
    "q_count_window" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .withColumn("win_idx", ((col("rn") - 1) / 5).cast("long"))
        .groupBy(col("user_id"), col("win_idx"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("total"),
          min(col("event_id")).as("first_offset"),
          max(col("event_id")).as("last_offset"))
    }),

    // §2.4 TableView materialization: key → latest value map.
    "q_tableview" -> ((s, d) => {
      Compaction.tableView(
        Tables.events(s, d).withColumnRenamed("event_type", "tv_value"),
        "user_id", "tv_value", col("event_id"))
    }),

    // §2.1 getMessageIdByTimestamp: first message position at/after a time.
    "q_msgid_by_ts" -> ((s, d) => {
      Tables.events(s, d)
        .where(unix_millis(col("ts")) >= midMs)
        .agg(min(col("event_id")).as("first_offset"))
    }),

    // §2.1 admin point lookup: getMessageById (exact offset).
    "q_msg_by_id" -> ((s, d) => {
      Tables.events(s, d).where(col("event_id") === 4242L)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
    }),

    // §2.4 approx_count_distinct (HLL). The sketch value is engine-specific,
    // so the hard check is the error bound vs the exact distinct count
    // computed in the same aggregation: a sketch drifting past 10% (HLL++
    // default rsd is 5%) flips the boolean and hash-fails the driver gate.
    "q_approx_distinct" -> ((s, d) => {
      Tables.events(s, d).groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("__approx"),
          countDistinct(col("user_id")).as("exact_users"),
          count(lit(1)).as("n"))
        .select(col("event_type"), col("exact_users"), col("n"),
          (abs(col("__approx") - col("exact_users"))
            <= col("exact_users") * 0.1).as("approx_within_10pct"))
    }),

    // §1.1 envelope round-trip: events → Message envelope → decoded payload.
    "q_envelope" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val env = graft.core.Envelope.fromEvents(Tables.events(s, d))
      val payload = StructType(Seq(StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType)))
      graft.core.Envelope.decodeJson(env, payload)
        .select(col("offset"), col("key"), col("producer_name"),
          col("sequence_id"), unix_millis(col("event_time")).as("event_time_ms"),
          col("decoded.event_type").as("event_type"),
          col("decoded.value").as("value"))
    }),

    // §2.1 CDC (Debezium-envelope) changelog → materialized current state:
    // each event upserts its user's row; an 'error' event is the delete op.
    // Latest change per key wins (event_id as the changelog position), keys
    // whose newest change is a delete vanish — one max_by aggregation.
    "q_cdc_materialize" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("value"), col("event_id"))
      val changes = graft.sources.Cdc.envelopeMixed(ev,
        when(col("event_type") === "error", graft.sources.Cdc.Deletes)
          .otherwise(graft.sources.Cdc.Updates),
        col("event_id"))
      graft.sources.Cdc.materialize(changes, Seq("user_id"))
    }),

    // First-touch attribution: each user's FIRST event type (ties by
    // event_id — deterministic), rolled up into the acquisition mix.
    // One min_by aggregate per user (map-side combinable), one rollup —
    // never a per-user sort.
    "q_first_touch" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(min_by(col("event_type"),
          struct(col("ts"), col("event_id"))).as("first_event"))
        .groupBy(col("first_event"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("first_event"))),

    // Rolling 7-day active users per day (WAU) — the sliding-DISTINCT
    // workload a tumbling window cannot express: daily (day, user) pairs
    // deduped once, then each day's window sums distinct users over its
    // trailing week via a broadcast day-grid range join.
    "q_rolling_active" -> ((s, d) => {
      val day = expr("unix_millis(ts) div 86400000")
      val du = Tables.events(s, d)
        .select(day.as("day"), col("user_id")).distinct()
      val days = du.select(col("day").as("d")).distinct()
      du.join(broadcast(days),
          col("day").between(col("d") - 6, col("d")))
        .groupBy(col("d"))
        .agg(countDistinct(col("user_id")).as("wau"))
        .orderBy(col("d"))
    }),

    // Ingest-freshness lag: per event type, newest event vs the global
    // high-water mark in ms — the staleness panel a pipeline monitor
    // alerts on. Two tiny aggregates, one broadcast.
    "q_freshness" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val per = ev.groupBy(col("event_type"))
        .agg(max(unix_millis(col("ts"))).as("newest_ms"),
          count(lit(1)).as("n_events"))
      val hwm = ev.agg(max(unix_millis(col("ts"))).as("hwm_ms"))
      per.crossJoin(broadcast(hwm))
        .withColumn("lag_ms", col("hwm_ms") - col("newest_ms"))
        .select(col("event_type"), col("n_events"), col("newest_ms"),
          col("lag_ms"))
        .orderBy(col("event_type"))
    }),

    // Cohort retention: users grouped by signup week, activity counted
    // per whole-week offset from THEIR signup — the retention matrix.
    // Week arithmetic in integer epoch-days (epoch_ms div 86400000 div 7)
    // so both engines bucket identically; distinct users per cell.
    "q_cohort_retention" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val wk = expr("unix_millis(ts) div 86400000 div 7")
      val signup = ev.where(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(wk).as("cohort_wk"))
      ev.where(col("event_type") =!= "signup")
        .select(col("user_id"), wk.as("act_wk"))
        .join(signup, "user_id")
        .where(col("act_wk") >= col("cohort_wk"))
        .groupBy(col("cohort_wk"),
          (col("act_wk") - col("cohort_wk")).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy(col("cohort_wk"), col("week_offset"))
    }),

    // Ordered funnel (view → click-after → purchase-after): per step the
    // count of users whose FIRST qualifying event strictly follows their
    // previous step's first event — the conversion table every event
    // pipeline reports. Three user-keyed aggregates chained by joins on
    // the same key; no windows, no per-user event lists.
    "q_funnel" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"))
      val v = ev.where(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val c = ev.where(col("event_type") === "click").join(v, "user_id")
        .where(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val p = ev.where(col("event_type") === "purchase").join(c, "user_id")
        .where(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_click_after")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase_after")))
    }),

    // Hourly trending top-3 event types — the "hot topics" analytics
    // shape: tumbling count per (window, type), rank WITHIN each window
    // (rk ≤ 3 as a filter ⇒ WindowGroupLimit heaps per hour), never a
    // global sort.
    "q_trending" -> ((s, d) => {
      val counts = Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_millis(col("w.start")).as("wstart_ms"),
          col("event_type"), col("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("wstart_ms"))
        .orderBy(col("n").desc, col("event_type"))
      counts.withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
        .orderBy(col("wstart_ms"), col("rk"))
    }),

    // Skew-proof two-phase aggregation: hot user keys spread over 8 salt
    // buckets in phase 1, merged per key in phase 2 — must equal the
    // plain rollup exactly (algebraic aggregates commute with the salt
    // split). The shape that keeps one viral key from pinning a reducer
    // at 100 TB.
    "q_salted_agg" -> ((s, d) =>
      graft.ops.Skew.saltedSumCount(Tables.events(s, d), Seq("user_id"),
          "value", saltBuckets = 8)
        .orderBy(col("user_id"))),

    // §2.1 CDC changelog → SCD Type-2 history: every change version per
    // user with [valid_from, valid_to) ranges and the is_current flag —
    // the warehouse-standard versioned dimension built from the same
    // Debezium envelope as q_cdc_materialize (whose result must equal
    // the is_current slice, spec'd). One lead-window per key.
    "q_cdc_history" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("value"),
          col("event_id"))
      val changes = graft.sources.Cdc.envelopeMixed(ev,
        when(col("event_type") === "error", graft.sources.Cdc.Deletes)
          .otherwise(graft.sources.Cdc.Updates),
        col("event_id"))
      graft.sources.Cdc.history(changes, Seq("user_id"))
        .select(col("user_id"), col("op"),
          col("after.event_type").as("event_type"),
          col("after.value").as("value"),
          col("valid_from"), col("valid_to"), col("is_current"))
        .orderBy(col("user_id"), col("valid_from"))
    }),

    // §2.1 KV/doc-store sink family (the Redis/HBase/Mongo sink analog):
    // the events changelog merges into an embedded compacted key→value
    // store in TWO out-of-order generation merges (odd event ids, then
    // even), 'error' events as null-state tombstones. Convergence is the
    // point: deletes race upserts by version (event_id), not arrival
    // order, so the store read back must equal the latest non-deleted
    // state per user — which is exactly what the oracle computes.
    "q_kv_store" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"),
        when(col("event_type") === "error", lit(null))
          .otherwise(col("event_type")).as("state"),
        col("value"), col("event_id"))
      val dir = java.nio.file.Files.createTempDirectory("graft-kv")
        .toFile.getAbsolutePath
      // the bucketed (scale-path) store: merge cost tracks the batch's
      // touched buckets, not the whole store — same oracle as unbucketed.
      // 4 buckets at bench scale: the per-bucket job overhead is the price
      // of the bucketed shape, so size buckets ≈ a few batches (the class
      // doc's sizing rule) rather than paying 16 tiny jobs per merge
      val store = new graft.ops.BucketedKvStore(s, dir, Seq("user_id"),
        col("event_id"), valueCol = "state", numBuckets = 4)
      graft.ops.KvStore.upsertBatch(ev.where(col("event_id") % 2 === 1),
        Seq("user_id"), col("event_id"), store)
      graft.ops.KvStore.upsertBatch(ev.where(col("event_id") % 2 === 0),
        Seq("user_id"), col("event_id"), store)
      store.read().select(col("user_id"), col("state"),
        col("value").as("last_value"), col("event_id"))
    }),

    // §2.9 chunked messages end-to-end: split every document into 256-byte
    // chunks, shuffle once on uuid, reassemble — must reproduce the corpus
    // byte-for-byte (ConsumerImpl.java:1365-1447 reassembly semantics).
    "q_chunk_roundtrip" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      graft.ops.Chunking.reassemble(
        graft.ops.Chunking.split(docs, "doc_id", "text", 256))
    }),

    // §2.9 dead-letter routing as a declared query: an 'error' event fails
    // processing and routes to retry with its redelivery count bumped; the
    // rest succeed (DeadLetterPolicy flow, batch-checkable disposition).
    "q_dlq_route" -> ((s, d) => {
      import s.implicits._
      val ds = Tables.events(s, d).select(col("event_id"), col("event_type"))
        .as[(Long, String)]
        .map { case (id, et) => graft.streaming.DeadLetter.Attempt((id, et), 0) }
      graft.streaming.DeadLetter.routeDataset(ds, maxRedeliverCount = 3) {
        case (_, et) =>
          if (et == "error") scala.util.Failure(new RuntimeException("poison"))
          else scala.util.Success(et)
      }.select(col("_1").as("disposition"),
        col("_2.record._1").as("event_id"),
        col("_2.redeliveryCount").as("redeliveries"))
    }),

    // §2.1 ES sink document mapping: date-pattern index routing + _id from
    // the message key + JSON document (IndexNameFormatter/JsonConverter).
    "q_es_documents" -> ((s, d) => {
      graft.ops.ElasticSink.documents(
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"), col("ts")),
        "events-%{+yyyy-MM-dd}", "ts", idCol = Some("event_id"),
        docCols = Some(Seq("user_id", "event_type")))
    }),

    // §2.2 consistent-hash Key_Shared assignment. The ring is deterministic
    // engine-side state, so the oracle embeds it as literal VALUES and
    // reproduces the md5-bit key position + first-point-at-or-after lookup
    // exactly — a full hash check of the selector.
    "q_key_shared_ring" -> ((s, d) => {
      val ring = graft.core.Envelope.keySharedRing(Seq("c-0", "c-1", "c-2"), 64)
      Tables.events(s, d).select(col("user_id")).distinct()
        .select(col("user_id"), graft.core.Envelope
          .keySharedConsistentAssign(col("user_id").cast("string"), ring)
          .as("consumer"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_window_tumbling" ->
      """SELECT (epoch_ms(ts) // 3600000) * 3600000 AS wstart_ms, event_type,
                count(*) AS n, sum(value) AS total
         FROM events GROUP BY 1, 2""",
    "q_window_sliding" ->
      """WITH g AS (SELECT epoch_ms(ts) AS ms, event_type FROM events)
         SELECT wstart_ms, event_type, count(*) AS n FROM (
           SELECT (ms // 1800000) * 1800000 AS wstart_ms, event_type FROM g
           UNION ALL
           SELECT (ms // 1800000) * 1800000 - 1800000 AS wstart_ms, event_type FROM g
         ) GROUP BY wstart_ms, event_type""",
    "q_session_window" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, value FROM events),
         flagged AS (
           SELECT user_id, ms, value,
                  CASE WHEN ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms)
                            >= 600000 OR lag(ms) OVER (PARTITION BY user_id
                            ORDER BY ms) IS NULL
                       THEN 1 ELSE 0 END AS new_session
           FROM e),
         sessions AS (
           SELECT user_id, ms, value,
                  sum(new_session) OVER (PARTITION BY user_id ORDER BY ms
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM flagged)
         SELECT user_id, min(ms) AS session_start_ms, count(*) AS n,
                sum(value) AS total
         FROM sessions GROUP BY user_id, sid""",
    "q_delayed_due" ->
      s"""SELECT event_id, user_id,
                 epoch_ms(ts) + (user_id % 60) * 60000 AS deliver_at_ms
          FROM events
          WHERE epoch_ms(ts) + (user_id % 60) * 60000 <= $midMs
            AND epoch_ms(ts) > $midMs - 7200000""",
    "q_ttl_expiry" ->
      s"""SELECT event_type, count(*) AS n_live, min(epoch_ms(ts)) AS oldest_ms
          FROM events WHERE epoch_ms(ts) > $endMs - 7 * 86400000
          GROUP BY event_type""",
    "q_late_data" ->
      """SELECT event_type,
                epoch_ms(ts) < (SELECT max(epoch_ms(ts)) FROM events) - 86400000
                  AS is_late,
                count(*) AS n
         FROM events GROUP BY 1, 2""",
    "q_dedup_seq" ->
      """WITH e AS (SELECT 'producer-' || CAST(user_id % 8 AS VARCHAR)
                      AS producer_name,
                    event_id AS sequence_id, value FROM events),
         redelivered AS (
           SELECT * FROM e
           UNION ALL SELECT * FROM e WHERE sequence_id % 7 = 0),
         deduped AS (
           SELECT producer_name, sequence_id, max(value) AS value
           FROM redelivered GROUP BY producer_name, sequence_id)
         SELECT producer_name, count(*) AS n_unique, sum(value) AS total_value
         FROM deduped GROUP BY producer_name""",
    "q_compact_last" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_type,
                value AS last_value
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                 ORDER BY event_id DESC) AS rn FROM events)
         WHERE rn = 1""",
    "q_compact_tombstone" ->
      """SELECT user_id, event_id AS last_event_id, v AS last_value FROM (
           SELECT user_id, event_id,
                  CASE WHEN value < 10.0 THEN NULL ELSE value END AS v,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY event_id DESC) AS rn
           FROM events)
         WHERE rn = 1 AND v IS NOT NULL""",
    "q_key_shared" ->
      """SELECT user_id, count(*) AS n FROM events
         WHERE user_id % 4 = 0 GROUP BY user_id""",
    "q_count_window" ->
      """SELECT user_id, win_idx, count(*) AS n, sum(value) AS total,
                min(event_id) AS first_offset, max(event_id) AS last_offset
         FROM (SELECT user_id, event_id, value,
                      CAST((row_number() OVER (PARTITION BY user_id
                        ORDER BY event_id) - 1) // 5 AS BIGINT) AS win_idx
               FROM events)
         GROUP BY user_id, win_idx""",
    "q_tableview" ->
      """SELECT user_id, event_type AS tv_value
         FROM (SELECT user_id, event_type, row_number() OVER (
                 PARTITION BY user_id ORDER BY event_id DESC) AS rn FROM events)
         WHERE rn = 1""",
    "q_msg_by_id" ->
      """SELECT event_id, user_id, event_type, value FROM events
         WHERE event_id = 4242""",
    "q_msgid_by_ts" ->
      s"""SELECT min(event_id) AS first_offset FROM events
          WHERE epoch_ms(ts) >= $midMs""",
    "q_envelope" ->
      """SELECT event_id AS offset, CAST(user_id AS VARCHAR) AS key,
                'producer-' || CAST(user_id % 8 AS VARCHAR) AS producer_name,
                event_id AS sequence_id, epoch_ms(ts) AS event_time_ms,
                event_type, value
         FROM events""",
    "q_cdc_materialize" ->
      """SELECT user_id, event_type, value, event_id
         FROM (SELECT user_id, event_type, value, event_id, row_number() OVER (
                 PARTITION BY user_id ORDER BY event_id DESC) AS rn FROM events)
         WHERE rn = 1 AND event_type <> 'error'""",
    "q_salted_agg" ->
      """SELECT user_id, sum(value) AS sum_value, count(*) AS count
         FROM events GROUP BY user_id ORDER BY user_id""",

    "q_first_touch" ->
      """SELECT first_event, count(*) AS n_users FROM (
           SELECT user_id, event_type AS first_event,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS rn
           FROM events)
         WHERE rn = 1 GROUP BY first_event ORDER BY first_event""",

    "q_rolling_active" ->
      """WITH du AS (
           SELECT DISTINCT epoch_ms(ts) // 86400000 AS day, user_id
           FROM events),
         dg AS (SELECT DISTINCT day AS d FROM du)
         SELECT d, count(DISTINCT user_id) AS wau
         FROM dg JOIN du ON du.day BETWEEN d - 6 AND d
         GROUP BY d ORDER BY d""",

    "q_freshness" ->
      """WITH hwm AS (SELECT max(epoch_ms(ts)) AS hwm_ms FROM events)
         SELECT event_type, count(*) AS n_events,
                max(epoch_ms(ts)) AS newest_ms,
                (SELECT hwm_ms FROM hwm) - max(epoch_ms(ts)) AS lag_ms
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q_cohort_retention" ->
      """WITH s AS (
           SELECT user_id, min(epoch_ms(ts) // 86400000 // 7) AS cohort_wk
           FROM events WHERE event_type = 'signup' GROUP BY user_id),
         a AS (
           SELECT user_id, epoch_ms(ts) // 86400000 // 7 AS act_wk
           FROM events WHERE event_type <> 'signup')
         SELECT s.cohort_wk, a.act_wk - s.cohort_wk AS week_offset,
                count(DISTINCT a.user_id) AS n_active
         FROM a JOIN s ON a.user_id = s.user_id
         WHERE a.act_wk >= s.cohort_wk
         GROUP BY s.cohort_wk, week_offset
         ORDER BY s.cohort_wk, week_offset""",

    "q_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
                   WHERE event_type = 'view' GROUP BY user_id),
         c AS (SELECT e.user_id, min(e.ts) AS t2
               FROM events e JOIN v ON e.user_id = v.user_id
               WHERE e.event_type = 'click' AND e.ts > v.t1
               GROUP BY e.user_id),
         p AS (SELECT e.user_id, min(e.ts) AS t3
               FROM events e JOIN c ON e.user_id = c.user_id
               WHERE e.event_type = 'purchase' AND e.ts > c.t2
               GROUP BY e.user_id)
         SELECT (SELECT count(*) FROM v) AS n_view,
                (SELECT count(*) FROM c) AS n_click_after,
                (SELECT count(*) FROM p) AS n_purchase_after""",

    "q_trending" ->
      """WITH c AS (
           SELECT (epoch_ms(ts) // 3600000) * 3600000 AS wstart_ms,
                  event_type, count(*) AS n
           FROM events GROUP BY 1, 2),
         r AS (SELECT *, row_number() OVER (PARTITION BY wstart_ms
                 ORDER BY n DESC, event_type) AS rk FROM c)
         SELECT wstart_ms, event_type, n, CAST(rk AS INT) AS rk
         FROM r WHERE rk <= 3 ORDER BY wstart_ms, rk""",

    "q_cdc_history" ->
      """SELECT user_id,
                CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op,
                CASE WHEN event_type = 'error' THEN NULL
                     ELSE event_type END AS event_type,
                CASE WHEN event_type = 'error' THEN NULL
                     ELSE value END AS value,
                event_id AS valid_from,
                lead(event_id) OVER (PARTITION BY user_id
                  ORDER BY event_id) AS valid_to,
                lead(event_id) OVER (PARTITION BY user_id
                  ORDER BY event_id) IS NULL
                  AND event_type <> 'error' AS is_current
         FROM events ORDER BY user_id, valid_from""",

    "q_kv_store" ->
      """SELECT user_id, event_type AS state, value AS last_value, event_id
         FROM (SELECT user_id, event_type, value, event_id, row_number() OVER (
                 PARTITION BY user_id ORDER BY event_id DESC) AS rn FROM events)
         WHERE rn = 1 AND event_type <> 'error'""",
    "q_chunk_roundtrip" ->
      """SELECT CAST(doc_id AS VARCHAR) AS uuid, text AS payload
         FROM documents""",
    "q_dlq_route" ->
      """SELECT CASE WHEN event_type = 'error' THEN 'retry' ELSE 'ok' END
                  AS disposition,
                event_id,
                CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                  AS redeliveries
         FROM events""",
    "q_es_documents" ->
      """SELECT 'events-' || strftime(ts, '%Y-%m-%d') AS "index",
                CAST(event_id AS VARCHAR) AS _id,
                CAST(to_json(struct_pack(user_id := user_id,
                                         event_type := event_type)) AS VARCHAR)
                  AS doc
         FROM events""",
    "q_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
                count(*) AS n, true AS approx_within_10pct
         FROM events GROUP BY event_type""",
    "q_key_shared_ring" -> {
      // the deterministic ring as literal VALUES; key position = hash16
      // (first 4 md5 nibbles), identical to TextFunctions.hash16
      val ring = graft.core.Envelope.keySharedRing(Seq("c-0", "c-1", "c-2"), 64)
      val ringVals = ring.map { case (p, c) => s"($p, '$c')" }.mkString(", ")
      def nib(i: Int) =
        s"(CASE WHEN ascii(substr(md5(CAST(user_id AS VARCHAR)), $i, 1)) <= 57" +
          s" THEN ascii(substr(md5(CAST(user_id AS VARCHAR)), $i, 1)) - 48" +
          s" ELSE ascii(substr(md5(CAST(user_id AS VARCHAR)), $i, 1)) - 87 END)"
      val h16 = s"(${nib(1)} * 4096 + ${nib(2)} * 256 + ${nib(3)} * 16 + ${nib(4)})"
      s"""WITH ring(pos, consumer) AS (SELECT * FROM (VALUES $ringVals) t(pos, consumer)),
          kp AS (SELECT user_id, $h16 % ${graft.core.Envelope.KeySharedRangeSize}
                   AS kpos
                 FROM (SELECT DISTINCT user_id FROM events))
          SELECT user_id, coalesce(
            (SELECT consumer FROM ring
             WHERE pos >= kpos ORDER BY pos, consumer LIMIT 1),
            (SELECT consumer FROM ring ORDER BY pos, consumer LIMIT 1))
            AS consumer
          FROM kp"""
    }
  )
}
