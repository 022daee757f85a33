package graft.api

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** The reference's user-function API surface as a thin Spark shim.
  *
  * Reference: `Function<X,T>.process(input, context)` — returning null drops
  * the record (filter), `context.publish(topic, obj)` fans out to other
  * topics, counters/state persist per key
  * (reference: pulsar-functions/api-java/.../Function.java:34-56,
  * Context.java:48-177; exec loop JavaInstanceRunnable.java:303-445).
  *
  * The executor runs the function inside `mapPartitions` — one JVM call per
  * record, no interpreter boundary — and exposes publishes as a side-output
  * Dataset (multi-sink fan-out) and counters as Spark accumulators.
  * Prefer declarative columns when the logic is expressible; this shim exists
  * for API parity with user code written against the reference.
  */
trait RecordContext extends Serializable {
  /** Counter state (reference: BaseContext.incrCounter :161-187). */
  def incrCounter(key: String, amount: Long): Unit
  /** Fan-out publish (reference: Context.publish :134-145). */
  def publish(topic: String, message: String): Unit
  /** User metadata of the current record (reference: Record.getProperties). */
  def currentKey: Option[String]
}

/** Per-record function: X → T, null/None result = drop (filter semantics). */
trait GraftFunction[X, T] extends Serializable {
  def process(input: X, ctx: RecordContext): Option[T]
}

/** N-records → 1 window function
  * (reference: WindowFunction.java:32-40 — process(Collection<Record>)). */
trait GraftWindowFunction[X, T] extends Serializable {
  def process(window: Seq[X], ctx: RecordContext): Option[T]
}

case class Published(topic: String, message: String)

object FunctionExecutor {

  private class ExecContext(counters: mutable.Map[String, LongAccumulator],
                            sink: mutable.Buffer[Published],
                            key: Option[String]) extends RecordContext {
    def incrCounter(k: String, amount: Long): Unit =
      counters.get(k).foreach(_.add(amount))
    def publish(topic: String, message: String): Unit =
      sink += Published(topic, message)
    def currentKey: Option[String] = key
  }

  /** Pre-register named counters (accumulators must exist before the job).
    * Caveat vs the reference's BookKeeper-backed counters: Spark accumulators
    * are at-least-once under task retries/speculation — use them for
    * monitoring parity, and state-store counters
    * ([[graft.streaming.StatefulOps]]) when exact counts matter. */
  def counters(spark: SparkSession, names: Seq[String]): Map[String, LongAccumulator] =
    names.map(n => n -> spark.sparkContext.longAccumulator(s"graft.fn.$n")).toMap

  /** Run a per-record function; returns (outputs, publishes). Both are lazy
    * Datasets — the function runs once per record per action, distributed. */
  def run[X, T](ds: Dataset[X], fn: GraftFunction[X, T],
                counterAccs: Map[String, LongAccumulator] = Map.empty,
                keyOf: X => Option[String] = (_: X) => None)
               (implicit te: Encoder[(Option[T], Seq[Published])])
  : Dataset[(Option[T], Seq[Published])] = {
    val accs = counterAccs // serializable closure capture
    ds.mapPartitions { it =>
      val counters = mutable.Map(accs.toSeq: _*)
      it.map { x =>
        val buf = mutable.Buffer.empty[Published]
        val ctx = new ExecContext(counters, buf, keyOf(x))
        (fn.process(x, ctx), buf.toSeq)
      }
    }
  }

  /** Collapse the executor output to the main stream (dropping nulls — the
    * filter contract). */
  def outputs[T](raw: Dataset[(Option[T], Seq[Published])])
                (implicit e: Encoder[T]): Dataset[T] =
    raw.flatMap(_._1.toSeq)

  /** The fan-out side channel as its own Dataset — route per topic to sinks. */
  def publishes[T](raw: Dataset[(Option[T], Seq[Published])])
                  (implicit e: Encoder[Published]): Dataset[Published] =
    raw.flatMap(_._2)
}
