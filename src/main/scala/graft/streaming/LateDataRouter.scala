package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Late-data side-output routing. Spark's watermark silently DROPS late rows;
  * the reference instead publishes them to `lateDataTopic`
  * (reference: WindowConfig.java:41; wiring WindowFunctionExecutor.java:109-118).
  *
  * This router reproduces that inside `foreachBatch`: it tracks the
  * watermark exactly as WaterMarkEventGenerator does — max event time seen in
  * PRIOR batches minus the allowed lag (WaterMarkEventGenerator.java:113-123)
  * — and splits each micro-batch into (on-time, late) so the caller can send
  * the late slice to its own sink while the on-time slice flows on.
  *
  * Usage:
  * {{{
  * val router = new LateDataRouter("event_time", lagMs = 60000)
  * stream.writeStream.foreachBatch { (batch, _) =>
  *   val (onTime, late) = router.split(batch)
  *   late.write.format("graft-topic").option("path", lateTopic).save()
  *   process(onTime)
  * }
  * }}}
  *
  * The router instance lives on the driver (foreachBatch bodies run there);
  * the split itself is a distributed filter.
  */
class LateDataRouter(eventTimeCol: String, lagMs: Long) extends Serializable {
  @volatile private var maxSeenMs: Long = Long.MinValue

  /** Current watermark (ms) — min across inputs is the caller's concern when
    * merging streams, same as the reference's per-topic tracking. */
  def watermarkMs: Long =
    if (maxSeenMs == Long.MinValue) Long.MinValue else maxSeenMs - lagMs

  /** Split a micro-batch into (onTime, late) against the watermark derived
    * from PRIOR batches, then advance the watermark with this batch's max
    * event time — the order WaterMarkEventGenerator emits in. */
  def split(batch: DataFrame): (DataFrame, DataFrame) = {
    val wm = watermarkMs
    val tsMs = unix_millis(col(eventTimeCol))
    // null event times route ON-TIME (3-valued logic would otherwise drop
    // them from BOTH slices — in the component whose whole point is that
    // nothing is silently dropped)
    val (onTime, late) =
      if (wm == Long.MinValue) (batch, batch.limit(0))
      else (batch.where(coalesce(tsMs >= wm, lit(true))),
        batch.where(coalesce(tsMs < wm, lit(false))))
    val batchMax = batch.agg(max(tsMs)).head()
    if (!batchMax.isNullAt(0))
      maxSeenMs = math.max(maxSeenMs, batchMax.getLong(0))
    (onTime, late)
  }
}
