package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Stream-stream co-process semantics: both topics live, pairing within a
  * tolerance, unmatched legs released by the watermark instead of dropped. */
class CoProcessSpec extends SparkSuite {
  import spark.implicits._

  test("watermarked two-stream enrichment pairs in-tolerance, releases unmatched") {
    implicit val sqlCtx = spark.sqlContext
    val orders = MemoryStream[(String, String, Timestamp)]
    val pays = MemoryStream[(String, Double, Timestamp)]

    val out = CoProcess.enrich(
      orders.toDF().toDF("okey", "item", "otime"),
      pays.toDF().toDF("pkey", "amount", "ptime"),
      "okey", "pkey", "otime", "ptime",
      lag = "10 seconds", tolerance = "30 seconds")

    val q = out.writeStream.format("memory").queryName("coprocess_out")
      .outputMode("append").start()

    // o1 paid 20s BEFORE the order (inside tolerance, out of arrival
    // order); o2 paid 5s before; o3 never paid; a payment 40s stale for
    // o2 is OUTSIDE tolerance and must not enrich it twice
    orders.addData(
      ("o1", "book", ts("2024-01-01 00:01:00")),
      ("o2", "pen", ts("2024-01-01 00:01:10")),
      ("o3", "ink", ts("2024-01-01 00:01:20")))
    pays.addData(
      ("o1", 9.5, ts("2024-01-01 00:00:40")),
      ("o2", 3.0, ts("2024-01-01 00:01:05")),
      ("o2", 99.0, ts("2024-01-01 00:00:30")))
    q.processAllAvailable()

    // push BOTH watermarks far ahead so o3's no-partner proof completes
    orders.addData(("o9", "end", ts("2024-01-01 00:10:00")))
    pays.addData(("o9x", 0.0, ts("2024-01-01 00:10:00")))
    q.processAllAvailable()
    orders.addData(("o10", "end2", ts("2024-01-01 00:20:00")))
    pays.addData(("o10x", 0.0, ts("2024-01-01 00:20:00")))
    q.processAllAvailable()

    val rows = spark.table("coprocess_out")
      .select("okey", "amount", "disposition")
      .as[(String, Option[Double], String)].collect()
    val byKey = rows.groupBy(_._1)

    assert(byKey("o1").toSet == Set(("o1", Some(9.5), "enriched")))
    // the 40s-stale payment is outside tolerance: exactly ONE enrichment
    assert(byKey("o2").toSet == Set(("o2", Some(3.0), "enriched")))
    // unmatched leg is EMITTED with null enrichment, not dropped
    assert(byKey("o3").toSet == Set(("o3", None, "unmatched")))
    q.stop()
  }

  test("state is bounded: matched rows emit without waiting for watermark") {
    implicit val sqlCtx = spark.sqlContext
    val l = MemoryStream[(String, String, Timestamp)]
    val r = MemoryStream[(String, Double, Timestamp)]
    val q = CoProcess.enrich(
      l.toDF().toDF("lk", "v", "lt"), r.toDF().toDF("rk", "w", "rt"),
      "lk", "rk", "lt", "rt", lag = "5 seconds", tolerance = "10 seconds")
      .writeStream.format("memory").queryName("coprocess_inner")
      .outputMode("append").start()
    l.addData(("a", "x", ts("2024-01-01 00:00:10")))
    r.addData(("a", 1.0, ts("2024-01-01 00:00:05")))
    q.processAllAvailable()
    // inner matches stream out before any watermark movement
    assert(spark.table("coprocess_inner")
      .where("disposition = 'enriched'").count() == 1)
    q.stop()
  }
}
