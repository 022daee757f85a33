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
