package graft.streaming

import java.nio.file.Files

import graft.SparkSuite
import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The production state-store face: every stateful streaming machine in
  * the library replayed under `RocksDBStateStoreProvider` and pinned to
  * byte-identical per-batch output vs the default (HDFS-backed in-memory)
  * provider. The existing streaming specs prove default-provider ==
  * batch-oracle; this spec closes the chain rocksdb == default, so the
  * deployment claim "RocksDB-backed in production" (the state store the
  * reference's durable function state in BookKeeper table service maps
  * to — pulsar-functions/instance/src/main/java/org/apache/pulsar/
  * functions/instance/JavaInstanceRunnable.java:384) is exercised, not
  * asserted. Each parity run also proves RocksDB actually engaged by
  * checking the checkpoint's state dir for RocksDB artifacts (.zip
  * snapshots / .changelog), which the default provider never writes.
  */
class RocksDbParitySpec extends SparkSuite {
  import spark.implicits._

  private val RocksCls =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ConfKey = "spark.sql.streaming.stateStore.providerClass"

  private def withProvider[T](cls: Option[String])(body: => T): T = {
    val prev = spark.conf.getOption(ConfKey)
    cls.fold(spark.conf.unset(ConfKey))(spark.conf.set(ConfKey, _))
    try body
    finally prev.fold(spark.conf.unset(ConfKey))(spark.conf.set(ConfKey, _))
  }

  /** Replay `batches` through `wire`; per-batch output rows as sorted
    * "batch|row" strings (batch id preserved so parity is per-micro-batch,
    * not just end-state) plus the checkpoint dir for state read-back. */
  private def replayBatches[T: Encoder](batches: Seq[Seq[T]], mode: String)(
      wire: Dataset[T] => DataFrame): (Seq[String], String) = {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[T]
    val cp = Files.createTempDirectory("rocks-cp").toFile.getAbsolutePath
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q = wire(source.toDS())
      .writeStream.outputMode(mode)
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.collect().foreach(r => buf.add(s"$id|$r")); ()
      }
      .option("checkpointLocation", cp)
      .start()
    batches.foreach { chunk =>
      if (chunk.nonEmpty) source.addData(chunk: _*)
      q.processAllAvailable()
    }
    q.stop()
    (buf.toArray(Array.empty[String]).toSeq.sorted, cp)
  }

  /** Files under the checkpoint's state dir (recursive). */
  private def stateFiles(cp: String): Seq[String] = {
    val root = new java.io.File(cp, "state")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    if (root.exists()) walk(root).map(_.getName) else Seq.empty
  }

  private def assertRocksEngaged(cp: String): Unit = {
    val fs = stateFiles(cp)
    assert(fs.exists(n => n.endsWith(".zip") || n.endsWith(".changelog")),
      s"RocksDB provider must write .zip/.changelog state artifacts; saw ${fs.take(8)}")
  }

  /** Run `wire` under both providers and pin per-batch output equality. */
  private def parity[T: Encoder](batches: Seq[Seq[T]], mode: String)(
      wire: Dataset[T] => DataFrame): String = {
    val (base, _) = withProvider(None)(replayBatches(batches, mode)(wire))
    val (rocks, cpR) = withProvider(Some(RocksCls))(replayBatches(batches, mode)(wire))
    assert(base.nonEmpty, "parity must not be vacuous")
    assertRocksEngaged(cpR)
    assert(rocks == base,
      s"provider-dependent output: default ${base.size} rows vs rocksdb ${rocks.size}; " +
        s"first diff ${base.zipAll(rocks, "<none>", "<none>").find(p => p._1 != p._2)}")
    cpR
  }

  // ---- fixtures ------------------------------------------------------

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val orderedEvents: Seq[UserEvent] =
    graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .orderBy(col("ts"), col("event_id"))
      .as[(Long, String, Long)].collect().toSeq
      .map { case (u, e, t) => UserEvent(u, e, t) }

  private def eventBatches(n: Int): Seq[Seq[UserEvent]] =
    orderedEvents.grouped(math.max(1, orderedEvents.size / n)).toSeq

  private def s2us(s: Long) = s * 1000000L

  // ---- the four EventAnalytics machines ------------------------------

  test("funnelProgress parity on the real events table") {
    parity(eventBatches(4), "update")(ds =>
      EventAnalytics.funnelProgress(ds).toDF())
  }

  test("rollingActiveIncrements parity on the real events table") {
    parity(eventBatches(4), "append")(ds =>
      EventAnalytics.rollingActiveIncrements(ds, window = 7).toDF())
  }

  test("cohortIncrements parity on the real events table") {
    parity(eventBatches(4), "append")(ds =>
      EventAnalytics.cohortIncrements(ds).toDF())
  }

  test("trendingTop parity on the real events table") {
    parity(eventBatches(4), "update")(ds =>
      EventAnalytics.trendingTop(ds, k = 3).toDF())
  }

  // ---- eviction under RocksDB: timeouts fire AND state leaves the store

  test("funnel eviction: EventTimeTimeout fires on RocksDB, key leaves the store") {
    val policy =
      EventAnalytics.Eviction(watermarkLagMs = 1000L, horizonMs = 3600000L)
    val batches = Seq(
      Seq(UserEvent(1L, "view", s2us(1000)), UserEvent(2L, "view", s2us(1000))),
      Seq(UserEvent(2L, "click", s2us(9000))),
      Seq(UserEvent(2L, "purchase", s2us(9100))),
      Seq(UserEvent(1L, "click", s2us(1500)))) // late, post-eviction
    val cpR = parity(batches, "update")(ds =>
      EventAnalytics.funnelProgress(ds, evict = Some(policy)).toDF())
    // read the ROCKSDB store back from the checkpoint: the silent key was
    // physically removed, the live key remains, the late row resurrected
    // nothing — the same population bound the eviction spec pins on the
    // default provider
    val keys = spark.read.format("statestore").load(cpR)
      .select("key.*").collect().map(_.getLong(0)).toSet
    assert(keys == Set(2L),
      s"u1 must be evicted from the RocksDB store and u2 retained, got $keys")
  }

  // ---- StatefulOps machines ------------------------------------------

  private def kmsgScenario: Seq[Seq[KeyedMsg]] = Seq(
    Seq(KeyedMsg("k1", "v1", 0L, ts("2024-01-01 00:00:00")),
      KeyedMsg("k2", "a1", 1L, ts("2024-01-01 00:00:01"))),
    Seq(KeyedMsg("k1", "v2", 5L, ts("2024-01-01 00:00:02")),
      KeyedMsg("k1", "stale", 3L, ts("2024-01-01 00:00:03"))),
    Seq(KeyedMsg("k1", null, 9L, ts("2024-01-01 00:00:04"))),
    Seq(KeyedMsg("k1", "v3", 11L, ts("2024-01-01 00:00:05")),
      KeyedMsg("k2", "a2", 12L, ts("2024-01-01 00:00:06"))))

  test("tableViewStream parity (upsert + tombstone + stale replay)") {
    parity(kmsgScenario, "update")(ds =>
      StatefulOps.tableViewStream(ds).toDF())
  }

  private def countWindowScenario: Seq[Seq[KeyedMsg]] = {
    val t0 = ts("2024-01-01 00:00:00")
    Seq((1 to 5), (6 to 7), (8 to 13)).map(r =>
      r.map(i => KeyedMsg("k", s"v$i", i.toLong, t0)) ++
        r.map(i => KeyedMsg("j", s"w$i", i.toLong, t0)))
  }

  test("tumblingCountWindow parity") {
    parity(countWindowScenario, "append")(ds =>
      StatefulOps.tumblingCountWindow(ds, 3).toDF())
  }

  test("slidingCountWindow parity") {
    parity(countWindowScenario, "append")(ds =>
      StatefulOps.slidingCountWindow(ds, 4, 2).toDF())
  }

  test("watermarkCountWindow parity") {
    val mk = (i: Int, s: String) => KeyedMsg("k", s"v$i", i.toLong, ts(s))
    val batches = Seq(
      Seq(mk(1, "2024-01-01 00:00:01"), mk(2, "2024-01-01 00:00:02")),
      Seq(mk(3, "2024-01-01 00:00:03"), mk(4, "2024-01-01 00:00:04")),
      // push the watermark: ripe events seal into windows
      Seq(mk(9, "2024-01-01 00:05:00")),
      Seq(mk(10, "2024-01-01 00:10:00")))
    parity(batches, "append")(ds =>
      StatefulOps.watermarkCountWindow(
        ds.toDF().withWatermark("eventTime", "10 seconds").as[KeyedMsg],
        3).toDF())
  }

  // ---- built-in streaming aggregation state --------------------------

  test("watermarked windowed aggregation parity (StateStore agg path)") {
    parity(eventBatches(4), "append") { ds =>
      ds.withColumn("et", timestamp_micros(col("ts_us")))
        .withWatermark("et", "1 hour")
        .groupBy(window(col("et"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), approx_count_distinct(col("user_id")).as("u"))
        .select(col("window.start").cast("long").as("ws"),
          col("event_type"), col("n"), col("u"))
    }
  }

  test("streaming dropDuplicates parity (dedup state path)") {
    val dup = orderedEvents ++ orderedEvents.take(500)
    parity(dup.grouped(math.max(1, dup.size / 4)).toSeq, "append") { ds =>
      ds.withColumn("et", timestamp_micros(col("ts_us")))
        .withWatermark("et", "1 hour")
        .dropDuplicates("user_id", "event_type", "ts_us")
        .select(col("user_id"), col("event_type"), col("ts_us"))
    }
  }

  // ---- CoProcess: stream-stream join state ---------------------------

  test("CoProcess two-stream enrichment parity") {
    def run(): Seq[String] = {
      implicit val sqlCtx = spark.sqlContext
      val orders = MemoryStream[(String, String, java.sql.Timestamp)]
      val pays = MemoryStream[(String, Double, java.sql.Timestamp)]
      val cp = Files.createTempDirectory("rocks-cop").toFile.getAbsolutePath
      val buf = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val q = CoProcess.enrich(
          orders.toDF().toDF("okey", "item", "otime"),
          pays.toDF().toDF("pkey", "amount", "ptime"),
          "okey", "pkey", "otime", "ptime",
          lag = "10 seconds", tolerance = "30 seconds")
        .select("okey", "amount", "disposition")
        .writeStream.outputMode("append")
        // no batch-id prefix here: with TWO memory sources the offsets can
        // land in one or two micro-batches run-to-run — rows, not batch
        // boundaries, are the provider-parity contract for this one
        .foreachBatch { (b: DataFrame, id: Long) =>
          b.collect().foreach(r => buf.add(r.toString)); ()
        }
        .option("checkpointLocation", cp).start()
      orders.addData(("o1", "book", ts("2024-01-01 00:01:00")),
        ("o2", "pen", ts("2024-01-01 00:01:10")),
        ("o3", "ink", ts("2024-01-01 00:01:20")))
      pays.addData(("o1", 9.5, ts("2024-01-01 00:00:40")),
        ("o2", 3.0, ts("2024-01-01 00:01:05")),
        ("o2", 99.0, ts("2024-01-01 00:00:30")))
      q.processAllAvailable()
      orders.addData(("o9", "end", ts("2024-01-01 00:10:00")))
      pays.addData(("o9x", 0.0, ts("2024-01-01 00:10:00")))
      q.processAllAvailable()
      orders.addData(("o10", "end2", ts("2024-01-01 00:20:00")))
      pays.addData(("o10x", 0.0, ts("2024-01-01 00:20:00")))
      q.processAllAvailable()
      q.stop()
      val rocksEngaged = stateFiles(cp)
        .exists(n => n.endsWith(".zip") || n.endsWith(".changelog"))
      if (spark.conf.getOption(ConfKey).contains(RocksCls))
        assert(rocksEngaged, "join state must live in RocksDB")
      buf.toArray(Array.empty[String]).toSeq.sorted
    }
    val base = withProvider(None)(run())
    val rocks = withProvider(Some(RocksCls))(run())
    assert(base.nonEmpty && rocks == base,
      s"stream-stream join parity: ${base.size} vs ${rocks.size}")
  }

  // ---- delayed delivery state machine --------------------------------

  test("delayedDeliveryBounded parity (timer state + bucket-spill routing)") {
    val batches = Seq(
      // bootstrap watermark, then near + far deliveries, then wm advances
      Seq(DelayedMsg("wm", "tick", 0L, ts("2024-01-01 00:00:20"))),
      Seq(DelayedMsg("k", "near", 1L, ts("2024-01-01 00:00:40")),
        DelayedMsg("k", "far", 2L, ts("2024-01-01 03:30:00"))),
      Seq(DelayedMsg("wm", "tick2", 3L, ts("2024-01-01 00:01:30"))),
      Seq(DelayedMsg("wm", "tick3", 4L, ts("2024-01-01 00:03:00"))))
    parity(batches, "append")(ds =>
      StatefulOps.delayedDeliveryBounded(
        ds.toDF().withWatermark("deliverAt", "10 seconds").as[DelayedMsg],
        horizonMs = 60000L, bucketMs = 3600000L).toDF())
  }
}
