package graft.streaming

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{Dataset, Encoder}

/** Dead-letter / retry routing: process each record with a user function; on
  * failure increment the redelivery count and route to retry until
  * `maxRedeliverCount`, then to the DLQ.
  *
  * Reference: DeadLetterPolicy (client/api/DeadLetterPolicy.java) +
  * reconsumeLater/retry-topic flow (ConsumerImpl.java:357-383,622-660):
  * after maxRedeliverCount nacks, the message is produced to
  * `<topic>-<sub>-DLQ`.
  *
  * Spark shape: inside `foreachBatch`, split the micro-batch into
  * (succeeded, retry, dead) and write each to its sink; re-feed `retry`
  * through the source (or a retry topic) — at-least-once, the reference's
  * guarantee for DLQ flows.
  */
object DeadLetter {

  case class Attempt[T](record: T, redeliveryCount: Int)

  /** Exponential redelivery backoff: the delay before redelivery attempt n
    * (1-based) is min(maxDelayMs, minDelayMs × multiplier^(n−1)) — the
    * MultiplierRedeliveryBackoff schedule (reference:
    * client/api/RedeliveryBackoff.java; NegativeAcksTracker.java:38 arms the
    * nack redelivery timer with it; retry topics in Pulsar are time-delayed). */
  case class RedeliveryBackoff(minDelayMs: Long, maxDelayMs: Long,
                               multiplier: Double = 2.0) {
    require(minDelayMs > 0 && maxDelayMs >= minDelayMs && multiplier >= 1.0)
    def delayMs(redeliveryCount: Int): Long = {
      val n = math.max(1, redeliveryCount)
      val d = minDelayMs * math.pow(multiplier, (n - 1).toDouble)
      if (d >= maxDelayMs.toDouble) maxDelayMs else d.toLong
    }
  }

  /** A retry attempt with its earliest redelivery time. */
  case class ScheduledAttempt[T](attempt: Attempt[T], deliverAtMs: Long)

  case class Routed[T, U](ok: Seq[(T, U)], retry: Seq[Attempt[T]],
                          dead: Seq[Attempt[T]])

  /** Pure per-batch router (collect-free when used via mapPartitions in
    * [[routeDataset]]; this Seq form is the unit-testable core). */
  def route[T, U](batch: Seq[Attempt[T]], maxRedeliverCount: Int)
                 (process: T => Try[U]): Routed[T, U] = {
    val results = batch.map(a => (a, process(a.record)))
    Routed(
      ok = results.collect { case (a, Success(u)) => (a.record, u) },
      retry = results.collect {
        case (a, Failure(_)) if a.redeliveryCount + 1 < maxRedeliverCount =>
          a.copy(redeliveryCount = a.redeliveryCount + 1)
      },
      dead = results.collect {
        case (a, Failure(_)) if a.redeliveryCount + 1 >= maxRedeliverCount =>
          a.copy(redeliveryCount = a.redeliveryCount + 1)
      })
  }

  /** [[route]] plus the redelivery schedule: each retry is stamped with
    * deliver-at = failure time + backoff(its new redelivery count). Feed the
    * scheduled retries through [[StatefulOps.delayedDelivery]] (the
    * retry-topic hold): attempt n is then not redelivered before its backoff
    * elapses, which is the reference's timed retry-topic behavior. */
  def routeWithBackoff[T, U](batch: Seq[Attempt[T]], maxRedeliverCount: Int,
                             backoff: RedeliveryBackoff, nowMs: Long)
                            (process: T => Try[U])
  : (Seq[(T, U)], Seq[ScheduledAttempt[T]], Seq[Attempt[T]]) = {
    val r = route(batch, maxRedeliverCount)(process)
    (r.ok,
      r.retry.map(a =>
        ScheduledAttempt(a, nowMs + backoff.delayMs(a.redeliveryCount))),
      r.dead)
  }

  /** Distributed form: tag each record with its disposition without
    * collecting — runs inside the executors, scale-safe. Disposition is
    * "ok" | "retry" | "dead". */
  def routeDataset[T, U](ds: Dataset[Attempt[T]], maxRedeliverCount: Int)
                        (process: T => Try[U])
                        (implicit e: Encoder[(String, Attempt[T])])
  : Dataset[(String, Attempt[T])] =
    ds.mapPartitions(_.map { a =>
      process(a.record) match {
        case Success(_) => ("ok", a)
        case Failure(_) if a.redeliveryCount + 1 < maxRedeliverCount =>
          ("retry", a.copy(redeliveryCount = a.redeliveryCount + 1))
        case Failure(_) =>
          ("dead", a.copy(redeliveryCount = a.redeliveryCount + 1))
      }
    })
}
