package graft.streaming

import java.sql.Timestamp

/** Typed message shapes for the stateful streaming operators. These mirror the
  * envelope columns the operators need (graft.core.Envelope has the full
  * schema); typed case classes keep `flatMapGroupsWithState` ergonomic.
  */
/** A keyed message — the compaction/TableView/window unit.
  * Reference: Message.getKey/getValue/getMessageId (Message.java:146/81/93). */
case class KeyedMsg(key: String, value: String, offset: Long, eventTime: Timestamp)

/** A producer-stamped message — the dedup unit.
  * Reference: MessageDeduplication.java:52-366 (producer → highest seq id). */
case class SeqMsg(producerName: String, sequenceId: Long, value: String,
                  eventTime: Timestamp)

/** A delayed message — deliver_at holds it back.
  * Reference: deliverAfter/deliverAt TypedMessageBuilder.java:199-214. */
case class DelayedMsg(key: String, value: String, offset: Long,
                      deliverAt: Timestamp)

/** Emitted window contents for count-window functions.
  * Reference: WindowFunction.process(Collection<Record>) WindowFunction.java:32-40. */
case class CountWindow(key: String, windowId: Long, values: Seq[String],
                       offsets: Seq[Long], size: Int)

/** TableView upsert notification (current value per key after each update).
  * Reference: TableView.listen / forEachAndListen (TableView.java:88-112). */
case class KeyUpdate(key: String, value: String, offset: Long)

/** Routed delayed message: disposition "deliver" (due now) or "defer"
  * (far-future — parked in bucket `bucket` instead of state).
  * Reference: the bucketed tracker's in-memory/snapshot split,
  * broker/.../delayed/bucket/BucketDelayedDeliveryTracker.java:67. */
case class DelayedRoute(key: String, value: String, offset: Long,
                        deliverAt: Timestamp, disposition: String, bucket: Long)
