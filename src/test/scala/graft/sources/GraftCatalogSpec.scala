package graft.sources

import java.nio.file.Files

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** SQL-catalog surface: topics addressable as `graft.ns.topic` from plain
  * spark.sql — DDL, INSERT (producer path), SELECT (scan with pruning),
  * listing, rename, drop. */
class GraftCatalogSpec extends SparkSuite {
  import spark.implicits._

  /** Registers the catalog on first use; every test must call it BEFORE its
    * first SQL statement — an unregistered `graft.x.y` falls through to the
    * session catalog and fails with REQUIRES_SINGLE_PART_NAMESPACE. */
  private lazy val root = {
    val r = Files.createTempDirectory("graft-catalog").toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.root", r)
    r
  }

  test("DDL + INSERT + SELECT round-trip through the catalog") {
    spark.sql(s"CREATE NAMESPACE graft.tenant1; -- root=$root".takeWhile(_ != ';'))
    spark.sql("CREATE TABLE graft.tenant1.clicks (topic STRING, partition INT, " +
      "offset BIGINT, key STRING, value STRING, publish_time TIMESTAMP)")

    // INSERT runs the real producer path (staged write + monotone reveal)
    (0 until 100).map(i =>
      ("t", i % 4, i.toLong, s"k${i % 10}", s"v$i", ts("2024-03-01 00:00:00")))
      .toDF("topic", "partition", "offset", "key", "value", "publish_time")
      .createOrReplaceTempView("src_rows")
    spark.sql("""INSERT INTO graft.tenant1.clicks
                 SELECT topic, partition, offset, key, value, publish_time
                 FROM src_rows""")

    val agg = spark.sql(
      """SELECT key, count(*) AS n, sum(offset) AS so
         FROM graft.tenant1.clicks GROUP BY key""").collect()
    assert(agg.length == 10 && agg.map(_.getLong(1)).sum == 100)
    // pruning-eligible predicate still answers correctly through SQL
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft.tenant1.clicks WHERE offset >= 90")
      .as[Long].head() == 10)
    // unset envelope columns (event_time, …) read back as null
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft.tenant1.clicks WHERE event_time IS NULL")
      .as[Long].head() == 100)
  }

  test("listing, rename, drop, and schema policing") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.tenant2")
    spark.sql("CREATE TABLE graft.tenant2.a (key STRING)")
    spark.sql("CREATE TABLE graft.tenant2.b (key STRING)")
    val tables = spark.sql("SHOW TABLES IN graft.tenant2")
      .select("tableName").as[String].collect().toSet
    assert(tables == Set("a", "b"))

    spark.sql("ALTER TABLE graft.tenant2.a RENAME TO tenant2.c")
    val after = spark.sql("SHOW TABLES IN graft.tenant2")
      .select("tableName").as[String].collect().toSet
    assert(after == Set("b", "c"))

    spark.sql("DROP TABLE graft.tenant2.b")
    assert(spark.sql("SHOW TABLES IN graft.tenant2").count() == 1)

    // non-envelope columns are rejected: the broker owns the schema
    val err = intercept[Exception](
      spark.sql("CREATE TABLE graft.tenant2.bad (wrong_col DOUBLE)"))
    assert(err.getMessage.contains("non-envelope") ||
      Option(err.getCause).exists(_.getMessage.contains("non-envelope")))
  }

  test("catalog tables stream: readStream.table consumes a graft.ns.topic") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.tenant4")
    spark.sql("CREATE TABLE graft.tenant4.feed (topic STRING, partition INT, " +
      "offset BIGINT, key STRING, value STRING, publish_time TIMESTAMP)")
    (0 until 30).map(i =>
      ("t", 0, i.toLong, s"k$i", s"v$i", ts("2024-03-01 00:00:00")))
      .toDF("topic", "partition", "offset", "key", "value", "publish_time")
      .createOrReplaceTempView("feed_rows")
    spark.sql("INSERT INTO graft.tenant4.feed SELECT * FROM feed_rows")

    val q = spark.readStream.table("graft.tenant4.feed")
      .groupBy().count()
      .writeStream.format("memory").queryName("catalog_stream")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(60000), "AvailableNow batch did not finish")
    assert(spark.table("catalog_stream").as[Long].head() == 30)
  }

  test("TIMESTAMP AS OF reads the topic as a consumer at t saw it") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.tenant5")
    val dir = new java.io.File(s"$root/tenant5/log")
    def append(offs: Range, t: java.sql.Timestamp): Unit =
      offs.map(i => ("t", 0, i.toLong, s"k$i", s"v$i", t, t, "p", i.toLong))
        .toDF("topic", "partition", "offset", "key", "value", "event_time",
          "publish_time", "producer_name", "sequence_id")
        .coalesce(1).write.format("graft-topic")
        .option("path", dir.getAbsolutePath).mode("append").save()
    append(0 until 40, ts("2024-01-01 00:00:00"))
    append(40 until 70, ts("2024-02-01 00:00:00"))
    // one row with NO publish stamp: unprovable at any t, excluded from
    // AS OF reads but visible to plain reads
    Seq(("t", 0, 70L, "k70", "v70", ts("2024-01-01 00:00:00"),
        Option.empty[java.sql.Timestamp], "p", 70L))
      .toDF("topic", "partition", "offset", "key", "value", "event_time",
        "publish_time", "producer_name", "sequence_id")
      .coalesce(1).write.format("graft-topic")
      .option("path", dir.getAbsolutePath).mode("append").save()

    def asOf(t: String): Long =
      spark.sql(s"SELECT count(*) AS c FROM graft.tenant5.log " +
        s"TIMESTAMP AS OF '$t'").as[Long].head()
    assert(asOf("2024-01-15 00:00:00") == 40)  // second batch invisible
    assert(asOf("2024-01-01 00:00:00") == 40)  // boundary inclusive
    assert(asOf("2023-12-31 23:59:59") == 0)
    assert(asOf("2024-06-01 00:00:00") == 70)  // unstamped row still excluded
    assert(spark.sql("SELECT count(*) AS c FROM graft.tenant5.log")
      .as[Long].head() == 71)
    // and the same contract through the cold tier: offload, re-ask
    assert(graft.ops.Offloader.offload(dir.getAbsolutePath,
      ts("2030-01-01 00:00:00").getTime) >= 2)
    assert(asOf("2024-01-15 00:00:00") == 40)
    assert(asOf("2024-06-01 00:00:00") == 70)
    // projection that drops publish_time still time-travels correctly
    val keys = spark.sql("SELECT key FROM graft.tenant5.log " +
      "TIMESTAMP AS OF '2024-01-15 00:00:00'").as[String].collect()
    assert(keys.length == 40 && keys.toSet == (0 until 40).map(i => s"k$i").toSet)
  }

  test("a topic written by the writer API is immediately SQL-visible") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.tenant3")
    val dir = new java.io.File(s"$root/tenant3/direct")
    (0 until 50).map(i =>
      ("t", 0, i.toLong, s"k$i", s"v$i", ts("2024-03-01 00:00:00"),
        ts("2024-03-01 00:00:00"), "p", i.toLong))
      .toDF("topic", "partition", "offset", "key", "value", "event_time",
        "publish_time", "producer_name", "sequence_id")
      .coalesce(1).write.format("graft-topic")
      .option("path", dir.getAbsolutePath).mode("append").save()
    assert(spark.sql("SELECT count(*) AS c FROM graft.tenant3.direct")
      .as[Long].head() == 50)
    assert(spark.sql("SHOW TABLES IN graft.tenant3")
      .select("tableName").as[String].collect().toSet == Set("direct"))
  }
}
