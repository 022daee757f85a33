package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming operators: the reference's broker/function-runtime state
  * machines re-expressed on `KeyValueGroupedDataset` state APIs. State lives
  * in Spark's state store (RocksDB-backed in production), partitioned by key —
  * the same per-key sharding Key_Shared dispatch gives the reference, which is
  * what makes these hold up on a 1000-executor cluster.
  */
object StatefulOps {

  // ---------------------------------------------------------------- TableView
  /** Streaming TableView: maintains last-value-per-key (by offset) and emits
    * the updated entry on every change — `TableView.forEachAndListen` parity
    * (reference: client/api/TableView.java:88-112; upsert-per-message
    * TableViewImpl.handleMessage :182). Null value = tombstone deletes the
    * key (emits a KeyUpdate with null value so sinks can delete too). */
  def tableViewStream(ds: Dataset[KeyedMsg]): Dataset[KeyUpdate] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[KeyUpdate, KeyUpdate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key, msgs, state: GroupState[KeyUpdate]) =>
          // Highest-offset message in this batch wins; compare with stored.
          val best = msgs.maxBy(_.offset)
          val cur = state.getOption
          if (cur.forall(_.offset < best.offset)) {
            val upd = KeyUpdate(key, best.value, best.offset)
            // A tombstone (null value) deletes the key from the VIEW
            // (TableViewImpl.handleMessage removes on null) and is emitted
            // so sinks delete too — but the stored entry keeps the offset
            // high-water mark: micro-batches can deliver out of order
            // across batches, and dropping state would let an older
            // redelivered offset resurrect the deleted key.
            state.update(upd)
            Iterator.single(upd)
          } else Iterator.empty // no change → the listener does not fire
      }
  }

  // ------------------------------------------------------------ count windows
  /** Tumbling count window (trigger = evict = windowLengthCount): buffers per
    * key, emits a window every `windowLength` records in offset order.
    * Reference: WindowConfig.windowLengthCount (WindowConfig.java:33),
    * CountTriggerPolicy/CountEvictionPolicy, WindowManager.add/onTrigger
    * (WindowManager.java:93-129).
    *
    * Records are processed in offset order within each key (the reference's
    * per-key ordering guarantee); a leftover partial window stays in state
    * until completed by later batches. */
  def tumblingCountWindow(ds: Dataset[KeyedMsg], windowLength: Int)
  : Dataset[CountWindow] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Seq[KeyedMsg], CountWindow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, msgs, state: GroupState[Seq[KeyedMsg]]) =>
          val buf = state.getOption.getOrElse(Seq.empty) ++
            msgs.toSeq.sortBy(_.offset)
          val full = buf.grouped(windowLength).toSeq
          val (complete, rest) = full.partition(_.size == windowLength)
          val leftover = rest.flatten
          // exact-multiple keys must CLEAR state, not store an empty Seq —
          // a high-cardinality key space would otherwise grow the state
          // store forever with empty entries
          if (leftover.nonEmpty) state.update(leftover) else state.remove()
          complete.zipWithIndex.iterator.map { case (w, i) =>
            CountWindow(key, w.head.offset, w.map(_.value), w.map(_.offset),
              w.size)
          }
      }
  }

  /** Sliding count window (slidingIntervalCount < windowLengthCount): emits
    * the last `windowLength` records every `slide` records.
    * Reference: WindowConfig.java:37; WindowManager sliding semantics
    * (WindowManager.java:93-129). State holds at most `windowLength` records
    * per key plus the slide phase — bounded memory. */
  def slidingCountWindow(ds: Dataset[KeyedMsg], windowLength: Int, slide: Int)
  : Dataset[CountWindow] = {
    import ds.sparkSession.implicits._
    // state: (retained tail of records, count since last emit)
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[(Seq[KeyedMsg], Int), CountWindow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, msgs, state: GroupState[(Seq[KeyedMsg], Int)]) =>
          var (tail, sinceEmit) = state.getOption.getOrElse((Seq.empty[KeyedMsg], 0))
          val out = Seq.newBuilder[CountWindow]
          msgs.toSeq.sortBy(_.offset).foreach { m =>
            tail = (tail :+ m).takeRight(windowLength)
            sinceEmit += 1
            if (sinceEmit == slide) {
              out += CountWindow(key, m.offset, tail.map(_.value),
                tail.map(_.offset), tail.size)
              sinceEmit = 0
            }
          }
          state.update((tail, sinceEmit))
          out.result().iterator
      }
  }

  /** Watermark-driven count window: like [[tumblingCountWindow]] but windows
    * are cut in EVENT-TIME order and only from events at or below the
    * watermark — so out-of-order arrival (within the allowed lag) cannot
    * change window membership. This is the reference's watermark count
    * trigger/eviction pair (WatermarkCountTriggerPolicy.java:34-65,
    * WatermarkCountEvictionPolicy.java): triggers fire as the watermark
    * passes events, not as they arrive. Requires `withWatermark` on
    * eventTime upstream. */
  def watermarkCountWindow(ds: Dataset[KeyedMsg], windowLength: Int)
  : Dataset[CountWindow] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Seq[KeyedMsg], CountWindow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, msgs, state: GroupState[Seq[KeyedMsg]]) =>
          val wm = state.getCurrentWatermarkMs()
          val buf = state.getOption.getOrElse(Seq.empty) ++ msgs
          // seal events the watermark has passed; cut windows in event-time
          // order (offset as the deterministic tie-break)
          val (ripe, unripe) = buf.partition(_.eventTime.getTime <= wm)
          val ordered = ripe.sortBy(m => (m.eventTime.getTime, m.offset))
          val emit = ordered.grouped(windowLength).toSeq
          val (complete, rest) = emit.partition(_.size == windowLength)
          val held = rest.flatten ++ unripe
          if (held.nonEmpty) {
            state.update(held)
            state.setTimeoutTimestamp(wm + 1 max 1) // wake on next wm advance
          } else state.remove()
          complete.iterator.map(w => CountWindow(key, w.head.offset,
            w.map(_.value), w.map(_.offset), w.size))
      }
  }

  /** Mixed trigger/eviction policy pair: COUNT trigger with TIME eviction —
    * every `triggerCount`-th record per key fires a window holding the
    * records whose event time lies within `windowDurationMs` of the
    * triggering record (reference: WindowManager with CountTriggerPolicy +
    * TimeEvictionPolicy — the four trigger×evict combos of
    * WindowConfig.java:33-39; this is the remaining mixed pair alongside
    * count/count, time/time and watermark-count). State is bounded by the
    * eviction horizon per key. */
  def countTriggerTimeEvict(ds: Dataset[KeyedMsg], triggerCount: Int,
                            windowDurationMs: Long): Dataset[CountWindow] = {
    import ds.sparkSession.implicits._
    // state: (retained records within horizon, records since last trigger)
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[(Seq[KeyedMsg], Int), CountWindow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, msgs, state: GroupState[(Seq[KeyedMsg], Int)]) =>
          var (buf, sinceTrigger) = state.getOption.getOrElse((Seq.empty[KeyedMsg], 0))
          val out = Seq.newBuilder[CountWindow]
          msgs.toSeq.sortBy(_.offset).foreach { m =>
            buf = (buf :+ m).filter(
              _.eventTime.getTime > m.eventTime.getTime - windowDurationMs)
            sinceTrigger += 1
            if (sinceTrigger == triggerCount) {
              val w = buf.sortBy(x => (x.eventTime.getTime, x.offset))
              out += CountWindow(key, m.offset, w.map(_.value),
                w.map(_.offset), w.size)
              sinceTrigger = 0
            }
          }
          state.update((buf, sinceTrigger))
          out.result().iterator
      }
  }

  // --------------------------------------------------------- delayed delivery
  /** Delayed delivery: hold each message in state until the event-time
    * watermark passes its deliver-at time, then release it. The watermark is
    * the clock, exactly like the tracker's `getScheduledMessages(cutoff)`
    * (reference: broker/.../delayed/InMemoryDelayedDeliveryTracker.java:70-117).
    * Requires `withWatermark` upstream. Clock choice: watermarking the
    * deliver-at column is fine when delays are short and uniform, but a
    * single far-future deliver-at then drags the watermark (= the clock)
    * forward and releases everything behind it early — when schedules span
    * hours+, watermark the PUBLISH/event-time column instead so the clock
    * tracks real arrival time (the tracker's `clock.millis()` cutoff). */
  def delayedDelivery(ds: Dataset[DelayedMsg]): Dataset[DelayedMsg] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Seq[DelayedMsg], DelayedMsg](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, msgs, state: GroupState[Seq[DelayedMsg]]) =>
          val wm = state.getCurrentWatermarkMs()
          val buf = state.getOption.getOrElse(Seq.empty) ++ msgs
          val (due, held) = buf.partition(_.deliverAt.getTime <= wm)
          if (held.nonEmpty) {
            state.update(held)
            // Wake up when the earliest deliver-at could be due.
            state.setTimeoutTimestamp(held.map(_.deliverAt.getTime).min max (wm + 1))
          } else state.remove()
          due.sortBy(m => (m.deliverAt.getTime, m.offset)).iterator
      }
  }

  /** Bounded-state delayed delivery — the bucketed tracker's memory posture
    * (reference: broker/.../delayed/bucket/BucketDelayedDeliveryTracker.java:67
    * keeps only near-term deliveries in the in-memory queue and snapshots
    * far-future ones to buckets re-loaded when their time nears). Messages
    * due within `horizonMs` of the watermark are held in state and released
    * like [[delayedDelivery]]; farther-future messages are NOT buffered —
    * they emit immediately as disposition "defer" with their deliver-at
    * bucket (`deliverAt / bucketMs`), for the caller to park in the
    * parking-lot topic (one partition per bucket, [[delayedBucketDir]]) and
    * re-ingest when the bucket nears. State is then bounded by
    * arrival-rate × horizon per key, independent of how far ahead
    * deliveries are scheduled. */
  def delayedDeliveryBounded(ds: Dataset[DelayedMsg], horizonMs: Long,
                             bucketMs: Long): Dataset[DelayedRoute] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Seq[DelayedMsg], DelayedRoute](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, msgs, state: GroupState[Seq[DelayedMsg]]) =>
          val wm = state.getCurrentWatermarkMs()
          val (near, far) = msgs.toSeq
            .partition(_.deliverAt.getTime <= wm + horizonMs)
          val buf = state.getOption.getOrElse(Seq.empty) ++ near
          val (due, held) = buf.partition(_.deliverAt.getTime <= wm)
          if (held.nonEmpty) {
            state.update(held)
            state.setTimeoutTimestamp(held.map(_.deliverAt.getTime).min max (wm + 1))
          } else state.remove()
          (due.sortBy(m => (m.deliverAt.getTime, m.offset)).map(m =>
            DelayedRoute(m.key, m.value, m.offset, m.deliverAt, "deliver", -1L)) ++
            far.map(m => DelayedRoute(m.key, m.value, m.offset, m.deliverAt,
              "defer", m.deliverAt.getTime / bucketMs))).iterator
      }
  }

  /** The partition directory a deferred message parks in, inside the
    * parking-lot topic ([[graft.streaming.DelayedBuckets.park]]): bucket
    * id = envelope partition, the same `partition-NNN` layout every
    * partitioned graft-topic uses, so ONE routed batch write parks every
    * bucket at once. */
  def delayedBucketDir(bucket: Long): String = {
    require(bucket >= 0 && bucket <= Int.MaxValue.toLong,
      s"bucket id $bucket does not fit the envelope partition column — " +
        "bucketMs is too small for the deliver-at range")
    f"partition-$bucket%03d"
  }

  /** Per-key dispatch throttling: emit at most `maxPerTrigger` records per
    * key per micro-batch in offset order, deferring the excess in state —
    * the flow-control permit model (reference: permits ServerCnx.handleFlow
    * :1910, PublishRateLimiterImpl; MessageDispatchThrottlingTest scenarios):
    * backpressure, never drops. Deferred records drain as later batches
    * deliver data for the key — dispatch happens on permits, so a key drains
    * whenever its arrival rate falls below the cap. (A recurring
    * processing-time timer would auto-drain idle keys but livelocks
    * processAllAvailable-style draining; callers wanting idle drain feed
    * periodic ticks per key.) */
  def throttleByKey(ds: Dataset[KeyedMsg], maxPerTrigger: Int)
  : Dataset[KeyedMsg] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Seq[KeyedMsg], KeyedMsg](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, msgs, state: GroupState[Seq[KeyedMsg]]) =>
          val buf = (state.getOption.getOrElse(Seq.empty) ++ msgs)
            .sortBy(_.offset)
          val (emit, held) = buf.splitAt(maxPerTrigger)
          if (held.nonEmpty) state.update(held) else state.remove()
          emit.iterator
      }
  }

  // -------------------------------------------------------------------- dedup
  /** Streaming producer-seq dedup: exactly one row per (producer, sequence)
    * within the watermark horizon — `MessageDeduplication` with a bounded
    * ledger (reference: MessageDeduplication.java:52-366). */
  def dedupByProducerSeq(df: DataFrame, eventTimeCol: String,
                         watermarkDelay: String): DataFrame =
    df.withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("producer_name", "sequence_id")

  // ------------------------------------------------------- windowed wordcount
  /** WordCount parity: per-key running count in update mode — the
    * incrCounter/getCounter loop of WordCountFunction
    * (reference: pulsar-functions/java-examples/.../WordCountFunction.java:31-36). */
  def wordCount(lines: DataFrame, textCol: String): DataFrame =
    lines.select(explode(split(col(textCol), "\\s+")).as("word"))
      .where(col("word") =!= "")
      .groupBy(col("word")).count()
}
