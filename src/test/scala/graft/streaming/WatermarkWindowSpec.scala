package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Watermark + event-time window semantics mirroring
  * WaterMarkEventGeneratorTest / WindowManagerTest scenarios: out-of-order
  * events inside the lag are aggregated; events older than the watermark are
  * dropped (the reference routes them to lateDataTopic). */
class WatermarkWindowSpec extends SparkSuite {
  import spark.implicits._

  test("tumbling event-time window aggregates out-of-order but drops late data") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KeyedMsg]
    val agg = in.toDF()
      .withWatermark("eventTime", "10 seconds")
      .groupBy(window(col("eventTime"), "1 minute"), col("key"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col("key"), col("n"))
    val q = agg.writeStream.format("memory").queryName("wm_out")
      .outputMode("append").start()

    // window [00:00, 00:01): 2 events, one out-of-order but within lag
    in.addData(
      KeyedMsg("k", "a", 0L, ts("2024-01-01 00:00:10")),
      KeyedMsg("k", "b", 1L, ts("2024-01-01 00:00:05")))
    q.processAllAvailable()
    // advance watermark far past the first window → it closes and emits
    in.addData(KeyedMsg("k", "c", 2L, ts("2024-01-01 00:05:00")))
    q.processAllAvailable()
    // this event is older than the watermark (00:04:50) → dropped
    in.addData(KeyedMsg("k", "late", 3L, ts("2024-01-01 00:00:30")))
    q.processAllAvailable()
    // close the second window too
    in.addData(KeyedMsg("k", "d", 4L, ts("2024-01-01 00:10:00")))
    q.processAllAvailable()

    val rows = spark.table("wm_out")
      .as[(java.sql.Timestamp, String, Long)].collect()
      .map { case (w, k, n) => (w.toInstant.toString, n) }.toMap
    q.stop()
    assert(rows("2024-01-01T00:00:00Z") == 2L) // late event NOT counted
    assert(rows("2024-01-01T00:05:00Z") == 1L)
  }

  test("session window closes after the gap passes under the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KeyedMsg]
    val agg = in.toDF()
      .withWatermark("eventTime", "0 seconds")
      .groupBy(session_window(col("eventTime"), "1 minute"), col("key"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("s"), col("key"), col("n"))
    val q = agg.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    // one session of 3 events (gaps < 1 min), then a far-future event closes it
    in.addData(
      KeyedMsg("k", "a", 0L, ts("2024-01-01 00:00:00")),
      KeyedMsg("k", "b", 1L, ts("2024-01-01 00:00:30")),
      KeyedMsg("k", "c", 2L, ts("2024-01-01 00:01:10")))
    q.processAllAvailable()
    in.addData(KeyedMsg("k", "z", 3L, ts("2024-01-01 01:00:00")))
    q.processAllAvailable()
    in.addData(KeyedMsg("k", "zz", 4L, ts("2024-01-01 02:00:00")))
    q.processAllAvailable()
    val rows = spark.table("sess_out")
      .as[(java.sql.Timestamp, String, Long)].collect()
      .map { case (s, _, n) => (s.toInstant.toString, n) }.toSet
    q.stop()
    assert(rows.contains(("2024-01-01T00:00:00Z", 3L))) // merged session of 3
    assert(rows.contains(("2024-01-01T01:00:00Z", 1L)))
  }

  test("LateDataRouter sends late rows to the side output instead of dropping") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KeyedMsg]
    val router = new LateDataRouter("eventTime", lagMs = 60000)
    val onTime = scala.collection.mutable.Buffer.empty[String]
    val late = scala.collection.mutable.Buffer.empty[String]
    val q = in.toDF().writeStream.foreachBatch {
      (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val (ok, l8) = router.split(batch)
        onTime ++= ok.select("value").as[String](spark.implicits.newStringEncoder).collect()
        late ++= l8.select("value").as[String](spark.implicits.newStringEncoder).collect()
        ()
    }.start()
    in.addData(KeyedMsg("k", "a", 0L, ts("2024-01-01 01:00:00")))
    q.processAllAvailable()
    // watermark now 00:59; this row is 2 minutes older → late side output;
    // the null event time lands on-time (NOT silently lost to 3VL)
    in.addData(KeyedMsg("k", "stale", 1L, ts("2024-01-01 00:57:00")),
      KeyedMsg("k", "fresh", 2L, ts("2024-01-01 01:01:00")),
      KeyedMsg("k", "no-ts", 3L, null))
    q.processAllAvailable()
    q.stop()
    assert(onTime.toSet == Set("a", "fresh", "no-ts"))
    assert(late.toSet == Set("stale")) // routed, not dropped
  }

  test("sliding event-time window assigns each event to len/slide windows") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KeyedMsg]
    val agg = in.toDF()
      .withWatermark("eventTime", "0 seconds")
      .groupBy(window(col("eventTime"), "1 minute", "30 seconds"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col("n"))
    val q = agg.writeStream.format("memory").queryName("slide_out")
      .outputMode("append").start()
    in.addData(KeyedMsg("k", "a", 0L, ts("2024-01-01 00:00:45")))
    q.processAllAvailable()
    in.addData(KeyedMsg("k", "z", 1L, ts("2024-01-01 00:10:00")))
    q.processAllAvailable()
    val starts = spark.table("slide_out")
      .as[(java.sql.Timestamp, Long)].collect().map(_._1.toInstant.toString)
      .toSet
    q.stop()
    assert(starts.contains("2024-01-01T00:00:00Z"))
    assert(starts.contains("2024-01-01T00:00:30Z"))
  }
}
