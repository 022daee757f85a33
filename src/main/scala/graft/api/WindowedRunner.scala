package graft.api

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.functions._

/** Executes a user [[GraftWindowFunction]] over event-time windows — the
  * WindowFunctionExecutor path (reference: pulsar-functions/.../windowing/
  * WindowFunctionExecutor.java:277-291: collect window contents, invoke
  * `process(Collection<Record>)`).
  *
  * Spark shape: `groupBy(window(...), key).agg(collect_list(...))` then one
  * function call per closed window. The window buffer lives in the
  * aggregation (spillable, partial-merged); only the per-window invocation is
  * user code. Works identically over a bounded DataFrame and a watermarked
  * stream (append mode emits each window once, on close — the trigger-policy
  * firing).
  */
object WindowedRunner {

  /** Tumbling (slide == len) or sliding time window over `eventTimeCol`,
    * keyed by `keyCol`; `payloadCol` rows are collected in event-time order
    * and passed to the function. */
  def runTumbling[T](df: DataFrame, eventTimeCol: String, keyCol: String,
                     payloadCol: String, windowLength: String,
                     fn: GraftWindowFunction[String, T], slide: Option[String] = None)
                    (implicit e: Encoder[(String, java.sql.Timestamp, T)])
  : DataFrame = {
    val w = slide.map(s => window(col(eventTimeCol), windowLength, s))
      .getOrElse(window(col(eventTimeCol), windowLength))
    val collected = df
      .groupBy(w.as("w"), col(keyCol).as("k"))
      .agg(sort_array(collect_list(struct(col(eventTimeCol).as("t"),
        col(payloadCol).as("p")))).as("items"))
    val spark = df.sparkSession
    import spark.implicits._
    collected
      .select(col("k"), col("w.start").as("wstart"),
        col("items.p").as("payloads"))
      .as[(String, java.sql.Timestamp, Seq[String])]
      .flatMap { case (k, ws, payloads) =>
        val ctx = new RecordContext {
          def incrCounter(key: String, amount: Long): Unit = ()
          def publish(topic: String, message: String): Unit = ()
          def currentKey: Option[String] = Some(k)
        }
        fn.process(payloads, ctx).map(r => (k, ws, r)).toSeq
      }.toDF("key", "window_start", "result")
    // NOTE: this variant's context drops publishes/counters — use
    // [[runTumblingWithPublishes]] when the window function fans out.
  }

  /** As [[runTumbling]] (String results), but CAPTURES the context side
    * channels instead of dropping them: returns (results, sideOutputs) where
    * sideOutputs rows are (topic, message, key, window_start) — publishes
    * verbatim, counters as topic "__counter:<name>" with the increment as the
    * message (WindowFunctionExecutor forwards both through
    * sendOutputMessage / the state sink). The evaluated windows are cached
    * so the user function runs ONCE per window even though two frames are
    * derived. */
  def runTumblingWithPublishes(df: DataFrame, eventTimeCol: String,
                               keyCol: String, payloadCol: String,
                               windowLength: String,
                               fn: GraftWindowFunction[String, String],
                               slide: Option[String] = None)
  : (DataFrame, DataFrame) = {
    val w = slide.map(s => window(col(eventTimeCol), windowLength, s))
      .getOrElse(window(col(eventTimeCol), windowLength))
    val collected = df
      .groupBy(w.as("w"), col(keyCol).as("k"))
      .agg(sort_array(collect_list(struct(col(eventTimeCol).as("t"),
        col(payloadCol).as("p")))).as("items"))
    val spark = df.sparkSession
    import spark.implicits._
    val evaluated = collected
      .select(col("k"), col("w.start").as("wstart"),
        col("items.p").as("payloads"))
      .as[(String, java.sql.Timestamp, Seq[String])]
      .map { case (k, ws, payloads) =>
        val side = scala.collection.mutable.Buffer.empty[(String, String)]
        val ctx = new RecordContext {
          def incrCounter(key: String, amount: Long): Unit =
            side += ((s"__counter:$key", amount.toString))
          def publish(topic: String, message: String): Unit =
            side += ((topic, message))
          def currentKey: Option[String] = Some(k)
        }
        val rs = fn.process(payloads, ctx).toSeq
        (k, ws, rs, side.toSeq)
      }.persist()
    val results = evaluated
      .flatMap { case (k, ws, rs, _) => rs.map(r => (k, ws, r)) }
      .toDF("key", "window_start", "result")
    val sideOut = evaluated
      .flatMap { case (k, ws, _, side) =>
        side.map { case (t, m) => (t, m, k, ws) } }
      .toDF("topic", "message", "key", "window_start")
    (results, sideOut)
  }
}
