package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Broker-side stream operators re-expressed as declarative DataFrame
  * combinators: delayed delivery, TTL expiry, late-data routing, backlog
  * analysis, peek/skip/seek. All are filters/aggregations Catalyst pushes into
  * the scan, so at 100 TB they prune parquet row groups instead of reading
  * everything.
  */
object EventOps {

  /** Delayed delivery due-set: the messages whose deliver-at time has passed at
    * `now`, in delivery order — what InMemoryDelayedDeliveryTracker's priority
    * queue dequeues (reference: broker/.../delayed/InMemoryDelayedDeliveryTracker.java:34-117;
    * deliverAfter/deliverAt TypedMessageBuilder.java:199-214). */
  def delayedDue(deliverAt: Column, now: Column): Column =
    deliverAt <= now

  /** TTL expiry: drop messages older than `ttl` relative to `now` — the cursor
    * fast-forward of PersistentMessageExpiryMonitor
    * (reference: broker/.../PersistentMessageExpiryMonitor.java:44-104). */
  def ttlKeep(publishTime: Column, now: Column, ttlSeconds: Long): Column =
    publishTime > (now - expr(s"INTERVAL $ttlSeconds SECONDS"))

  /** Late-data predicate: event older than (maxEventTime − lag) is late — the
    * watermark rule of WaterMarkEventGenerator.computeWaterMarkTs
    * (reference: pulsar-functions/.../windowing/WaterMarkEventGenerator.java:113-123),
    * with late rows routed to a side output (WindowConfig.lateDataTopic,
    * reference: WindowConfig.java:41). Batch form: the watermark is the global
    * max event time minus the allowed lag. */
  def lateSplit(df: DataFrame, eventTime: String, lagSeconds: Long): DataFrame = {
    val wm = df.agg(max(col(eventTime)).as("__max_t"))
    df.crossJoin(broadcast(wm))
      .withColumn("is_late",
        col(eventTime) < col("__max_t") - expr(s"INTERVAL $lagSeconds SECONDS"))
      .drop("__max_t")
  }

  /** Backlog analysis between two cursor positions: entries + bytes in
    * (fromOffset, toOffset] (reference: Topics.analyzeSubscriptionBacklog
    * pulsar-client-admin-api/.../Topics.java:2133, AnalyzeBacklogResult). */
  def backlog(df: DataFrame, offsetCol: String, sizeExpr: Column,
              fromOffset: Long, toOffset: Long): DataFrame =
    df.where(col(offsetCol) > fromOffset && col(offsetCol) <= toOffset)
      .agg(count(lit(1)).as("entries"),
        // BIGINT on both engines: DuckDB's sum() widens to HUGEINT, which
        // hash-diverges from Spark's LongType even when values agree.
        sum(sizeExpr).cast("long").as("bytes"))
}
