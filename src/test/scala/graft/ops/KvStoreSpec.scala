package graft.ops

import java.io.File
import java.nio.file.Files

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The embedded KV-store sink: last-write-wins upsert, versioned
  * tombstones, TTL, generation durability, replay idempotence, and the
  * streaming foreachBatch wiring. */
class KvStoreSpec extends SparkSuite {
  import spark.implicits._

  private def newStore(dir: String, expireAtCol: Option[String] = None) =
    new ParquetKvStore(spark, dir, Seq("k"), col("ver"), "v", expireAtCol)

  private def rows(t: (String, java.lang.Long, String)*) =
    t.toSeq.toDF("k", "ver", "v")
      .select(col("k"), col("ver").cast("long").as("ver"), col("v"))

  test("last-write-wins across merges; null value is a versioned tombstone") {
    val dir = Files.createTempDirectory("kv").toFile.getAbsolutePath
    val store = newStore(dir)
    KvStore.upsertBatch(rows(("a", 1L, "a1"), ("b", 1L, "b1"), ("a", 2L, "a2")),
      Seq("k"), col("ver"), store)
    assert(store.read().select("k", "v").as[(String, String)].collect().toSet ==
      Set(("a", "a2"), ("b", "b1")))
    // delete b at ver 3, update a at ver 3
    KvStore.upsertBatch(rows(("b", 3L, null), ("a", 3L, "a3")),
      Seq("k"), col("ver"), store)
    assert(store.read().select("k", "v").as[(String, String)].collect().toSet ==
      Set(("a", "a3")))
  }

  test("deletes race upserts by version, not arrival order") {
    val dir = Files.createTempDirectory("kv-ooo").toFile.getAbsolutePath
    val store = newStore(dir)
    // the NEWER update arrives first, the OLDER delete second — an
    // unversioned DEL would destroy the newer value; the tombstone loses
    KvStore.upsertBatch(rows(("a", 5L, "a5")), Seq("k"), col("ver"), store)
    KvStore.upsertBatch(rows(("a", 3L, null)), Seq("k"), col("ver"), store)
    assert(store.read().select("k", "v").as[(String, String)].collect().toSet ==
      Set(("a", "a5")))
    // and the mirror: a newer delete beats an older update arriving late
    KvStore.upsertBatch(rows(("a", 9L, null)), Seq("k"), col("ver"), store)
    KvStore.upsertBatch(rows(("a", 7L, "a7")), Seq("k"), col("ver"), store)
    assert(store.read().count() == 0)
  }

  test("replaying a batch is idempotent") {
    val dir = Files.createTempDirectory("kv-replay").toFile.getAbsolutePath
    val store = newStore(dir)
    val batch = rows(("a", 1L, "a1"), ("b", 2L, null), ("c", 3L, "c3"))
    KvStore.upsertBatch(batch, Seq("k"), col("ver"), store)
    val first = store.read().collect().map(_.toSeq).toSet
    KvStore.upsertBatch(batch, Seq("k"), col("ver"), store)
    assert(store.read().collect().map(_.toSeq).toSet == first)
  }

  test("TTL: expired entries are invisible and cannot shadow live data") {
    val dir = Files.createTempDirectory("kv-ttl").toFile.getAbsolutePath
    val store = new ParquetKvStore(spark, dir, Seq("k"), col("ver"), "v",
      expireAtCol = Some("expire_at"))
    val now = System.currentTimeMillis()
    val batch = Seq(
      ("live", 1L, "x", java.lang.Long.valueOf(now + 3600000L)),
      ("gone", 1L, "y", java.lang.Long.valueOf(now - 1000L)),
      ("keep", 1L, "z", null.asInstanceOf[java.lang.Long]))
      .toDF("k", "ver", "v", "expire_at")
      .select(col("k"), col("ver").cast("long"), col("v"),
        col("expire_at").cast("long"))
    KvStore.upsertBatch(batch, Seq("k"), col("ver"), store)
    assert(store.read().select("k").as[String].collect().toSet ==
      Set("live", "keep"))
    // the reap is real: after the next merge the expired row is gone from
    // the stored generation too, so an older live version cannot lose to a
    // vanished competitor
    KvStore.upsertBatch(
      Seq(("other", 2L, "w", null.asInstanceOf[java.lang.Long]))
        .toDF("k", "ver", "v", "expire_at")
        .select(col("k"), col("ver").cast("long"), col("v"),
          col("expire_at").cast("long")),
      Seq("k"), col("ver"), store)
    // current + the generation it replaced are retained (lazy readers of
    // the previous generation stay scannable); older ones are reaped
    val gen = new File(dir).listFiles().filter(_.getName.startsWith("gen-"))
    assert(gen.map(_.getName).toSet == Set("gen-0", "gen-1"))
    assert(spark.read.parquet(new File(dir, "gen-1").getAbsolutePath)
      .where(col("k") === "gone").count() == 0)
  }

  test("a lazy read() stays scannable across one merge cycle") {
    val dir = Files.createTempDirectory("kv-lazy").toFile.getAbsolutePath
    val store = newStore(dir)
    KvStore.upsertBatch(rows(("a", 1L, "a1")), Seq("k"), col("ver"), store)
    val lazyDf = store.read() // bound to gen-0's files, not yet executed
    KvStore.upsertBatch(rows(("b", 2L, "b2")), Seq("k"), col("ver"), store)
    // gen-0 must still exist: executing the pre-merge DataFrame now reads
    // the old snapshot rather than throwing FileNotFoundException
    assert(lazyDf.select("k", "v").as[(String, String)].collect().toSet ==
      Set(("a", "a1")))
    assert(store.read().select("k").as[String].collect().toSet == Set("a", "b"))
  }

  test("TTL reaping is symmetric: an expired incoming entry cannot destroy stored live data") {
    val dir = Files.createTempDirectory("kv-ttl-sym").toFile.getAbsolutePath
    val now = System.currentTimeMillis()
    val store = new ParquetKvStore(spark, dir, Seq("k"), col("ver"), "v",
      expireAtCol = Some("expire_at"))
    def batch(rows: Seq[(String, Long, String, java.lang.Long)]) =
      rows.toDF("k", "ver", "v", "expire_at")
        .select(col("k"), col("ver").cast("long"), col("v"),
          col("expire_at").cast("long"))
    // stored: live k@ord=3; incoming: already-expired k@ord=9 — the higher
    // ord must NOT shadow-win and then vanish (which would destroy ord=3)
    KvStore.upsertBatch(batch(Seq(("k", 3L, "live", null))),
      Seq("k"), col("ver"), store)
    KvStore.upsertBatch(
      batch(Seq(("k", 9L, "dead", java.lang.Long.valueOf(now - 1000L)))),
      Seq("k"), col("ver"), store)
    assert(store.read().select("k", "v").as[(String, String)].collect().toSet ==
      Set(("k", "live")))
    // mirror arrival order converges to the same state
    val dir2 = Files.createTempDirectory("kv-ttl-sym2").toFile.getAbsolutePath
    val store2 = new ParquetKvStore(spark, dir2, Seq("k"), col("ver"), "v",
      expireAtCol = Some("expire_at"))
    KvStore.upsertBatch(
      batch(Seq(("k", 9L, "dead", java.lang.Long.valueOf(now - 1000L)))),
      Seq("k"), col("ver"), store2)
    KvStore.upsertBatch(batch(Seq(("k", 3L, "live", null))),
      Seq("k"), col("ver"), store2)
    assert(store2.read().select("k", "v").as[(String, String)].collect().toSet ==
      Set(("k", "live")))
  }

  test("bucketed store: converges like the unbucketed one across out-of-order merges") {
    val dir = Files.createTempDirectory("kv-bucketed").toFile.getAbsolutePath
    val store = new BucketedKvStore(spark, dir, Seq("k"), col("ver"), "v",
      numBuckets = 8)
    // newest-first arrival, tombstone racing an older upsert by version
    KvStore.upsertBatch(rows(("a", 5L, "a5"), ("b", 4L, null)),
      Seq("k"), col("ver"), store)
    KvStore.upsertBatch(rows(("a", 2L, "a2"), ("b", 1L, "b1"), ("c", 3L, "c3")),
      Seq("k"), col("ver"), store)
    assert(store.read().select("k", "v").as[(String, String)].collect().toSet ==
      Set(("a", "a5"), ("c", "c3"))) // b's newest state is the tombstone
  }

  test("bucketed store: a merge rewrites only the buckets its batch touches") {
    val dir = Files.createTempDirectory("kv-touch").toFile.getAbsolutePath
    val store = new BucketedKvStore(spark, dir, Seq("k"), col("ver"), "v",
      numBuckets = 16)
    KvStore.upsertBatch(
      rows((1 to 50).map(i =>
        (s"k$i", java.lang.Long.valueOf(1L), s"v$i")): _*),
      Seq("k"), col("ver"), store)
    def gensPerBucket() = new File(dir).listFiles()
      .filter(_.getName.startsWith("bucket-")).map { b =>
        b.getName -> b.listFiles().map(_.getName)
          .filter(_.startsWith("gen-")).sorted.toSeq
      }.toMap
    val before = gensPerBucket()
    // a single-key batch must advance exactly ONE bucket's generation chain
    KvStore.upsertBatch(rows(("k1", 2L, "v1b")), Seq("k"), col("ver"), store)
    val after = gensPerBucket()
    val changed = after.filter { case (b, gens) => before.get(b) != Some(gens) }
    assert(changed.size == 1,
      s"expected 1 rewritten bucket, got ${changed.keys.mkString(", ")}")
    assert(store.read().where(col("k") === "k1")
      .select("v").as[String].collect().toSeq == Seq("v1b"))
  }

  test("bucketed store: bucket count is fixed at creation") {
    val dir = Files.createTempDirectory("kv-fixed").toFile.getAbsolutePath
    val store = new BucketedKvStore(spark, dir, Seq("k"), col("ver"), "v",
      numBuckets = 8)
    KvStore.upsertBatch(rows(("a", 1L, "a1")), Seq("k"), col("ver"), store)
    val e = intercept[IllegalArgumentException] {
      new BucketedKvStore(spark, dir, Seq("k"), col("ver"), "v", numBuckets = 32)
    }
    assert(e.getMessage.contains("fixed"))
    // reopening with the same count works and sees the data
    val reopened = new BucketedKvStore(spark, dir, Seq("k"), col("ver"), "v",
      numBuckets = 8)
    assert(reopened.read().select("k").as[String].collect().toSeq == Seq("a"))
  }

  test("bucketed store: reapAll drops expired entries from buckets no batch touches") {
    val dir = Files.createTempDirectory("kv-reap").toFile.getAbsolutePath
    val now = System.currentTimeMillis()
    val store = new BucketedKvStore(spark, dir, Seq("k"), col("ver"), "v",
      expireAtCol = Some("expire_at"), numBuckets = 8)
    def batch(rows: Seq[(String, Long, String, java.lang.Long)]) =
      rows.toDF("k", "ver", "v", "expire_at")
        .select(col("k"), col("ver").cast("long"), col("v"),
          col("expire_at").cast("long"))
    // "cold" is LIVE at insert (so it lands on disk — merge reaps anything
    // already expired) and expires shortly after
    KvStore.upsertBatch(batch(Seq(
      ("cold", 1L, "x", java.lang.Long.valueOf(now + 1200L)),
      ("live", 1L, "y", null))), Seq("k"), col("ver"), store)
    // after expiry the row is invisible but still ON DISK in its bucket
    def storedKeys() = new File(dir).listFiles()
      .filter(_.getName.startsWith("bucket-"))
      .flatMap(b => b.listFiles().filter(_.getName.startsWith("gen-"))
        .sortBy(_.getName).lastOption)
      .map(g => spark.read.parquet(g.getAbsolutePath))
      .reduce(_ unionByName _).select("k").as[String].collect().toSet
    assert(storedKeys() == Set("cold", "live"))
    Thread.sleep(1500) // let "cold" expire; no batch touches its bucket
    store.reapAll()
    assert(storedKeys() == Set("live"),
      "reapAll must rewrite cold buckets without any incoming batch")
    assert(store.read().select("k").as[String].collect().toSet == Set("live"))
  }

  test("bucketed store: a corrupt _buckets file is refused, not guessed") {
    val dir = Files.createTempDirectory("kv-corrupt").toFile.getAbsolutePath
    val store = new BucketedKvStore(spark, dir, Seq("k"), col("ver"), "v",
      numBuckets = 8)
    KvStore.upsertBatch(rows(("a", 1L, "a1")), Seq("k"), col("ver"), store)
    java.nio.file.Files.write(new File(dir, "_buckets").toPath,
      "".getBytes("UTF-8"))
    val e = intercept[IllegalStateException] {
      new BucketedKvStore(spark, dir, Seq("k"), col("ver"), "v", numBuckets = 8)
    }
    assert(e.getMessage.contains("corrupt"))
  }

  test("tombstone retention: deleted keys leave disk past the horizon, convergence holds within it") {
    val dir = Files.createTempDirectory("kv-tomb").toFile.getAbsolutePath
    val store = new ParquetKvStore(spark, dir, Seq("k"), col("ver"), "v",
      tombstoneRetainMs = Some(0L))
    KvStore.upsertBatch(rows(("a", 1L, "a1"), ("b", 1L, "b1")),
      Seq("k"), col("ver"), store)
    KvStore.upsertBatch(rows(("a", 2L, null)), Seq("k"), col("ver"), store)
    // the tombstone IS persisted by its own merge (it must beat ord=1)
    def storedKeys() = spark.read.parquet(store.currentGenPath.get)
      .select("k").as[String].collect().toSet
    assert(storedKeys() == Set("a", "b"))
    Thread.sleep(5) // let the 0ms horizon pass
    KvStore.upsertBatch(rows(("c", 3L, "c3")), Seq("k"), col("ver"), store)
    assert(storedKeys() == Set("b", "c"),
      "a tombstone past its horizon must leave disk at the next merge")
    // a replay from BEFORE the horizon resurrects the key — the documented
    // tombstone-GC contract (choose the horizon beyond the replay window)
    KvStore.upsertBatch(rows(("a", 1L, "a1")), Seq("k"), col("ver"), store)
    assert(store.read().where(col("k") === "a").count() == 1)

    // within the horizon, convergence is intact: a newer delete still beats
    // an older upsert replayed after it
    val dir2 = Files.createTempDirectory("kv-tomb2").toFile.getAbsolutePath
    val store2 = new ParquetKvStore(spark, dir2, Seq("k"), col("ver"), "v",
      tombstoneRetainMs = Some(3600000L))
    KvStore.upsertBatch(rows(("d", 9L, null)), Seq("k"), col("ver"), store2)
    KvStore.upsertBatch(rows(("d", 7L, "d7")), Seq("k"), col("ver"), store2)
    assert(store2.read().count() == 0)
    // the reap stamp is bookkeeping: never in read()'s schema
    assert(!store2.read().columns.contains("__reap_at"))
  }

  test("bucketed store: reapAll drops expired tombstones from untouched buckets") {
    val dir = Files.createTempDirectory("kv-tomb-b").toFile.getAbsolutePath
    val store = new BucketedKvStore(spark, dir, Seq("k"), col("ver"), "v",
      numBuckets = 4, tombstoneRetainMs = Some(0L))
    KvStore.upsertBatch(rows(("a", 1L, "a1"), ("b", 2L, null)),
      Seq("k"), col("ver"), store)
    def storedKeys() = new File(dir).listFiles()
      .filter(_.getName.startsWith("bucket-"))
      .flatMap(b => b.listFiles().filter(_.getName.startsWith("gen-"))
        .sortBy(_.getName).lastOption)
      .map(g => spark.read.parquet(g.getAbsolutePath))
      .reduce(_ unionByName _).select("k").as[String].collect().toSet
    assert(storedKeys() == Set("a", "b"))
    Thread.sleep(5)
    store.reapAll()
    assert(storedKeys() == Set("a"),
      "reapAll must retire horizon-expired tombstones with no incoming batch")
  }

  test("a crash orphan generation never breaks the next merge") {
    val dir = Files.createTempDirectory("kv-crash").toFile.getAbsolutePath
    val store = newStore(dir)
    KvStore.upsertBatch(rows(("a", 1L, "a1")), Seq("k"), col("ver"), store)
    // simulate a crash AFTER writing a generation but BEFORE the pointer
    // swap: an orphan gen dir exists that _current does not reference
    new File(dir, "gen-7").mkdirs()
    KvStore.upsertBatch(rows(("b", 2L, "b2")), Seq("k"), col("ver"), store)
    assert(store.read().select("k", "v").as[(String, String)].collect().toSet ==
      Set(("a", "a1"), ("b", "b2")))
  }

  test("streaming sink: micro-batches merge through foreachBatch") {
    val dir = Files.createTempDirectory("kv-stream").toFile.getAbsolutePath
    val store = newStore(dir)
    implicit val sqlCtx = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long, String)]
    val df = source.toDF().toDF("k", "ver", "raw")
      .select(col("k"), col("ver"),
        when(col("raw") === "DEL", lit(null)).otherwise(col("raw")).as("v"))
    val q = KvStore.sink(df, Seq("k"), col("ver"), store)
      .option("checkpointLocation",
        Files.createTempDirectory("kv-cp").toFile.getAbsolutePath)
      .start()
    source.addData(("a", 1L, "a1"), ("b", 1L, "b1"))
    q.processAllAvailable()
    source.addData(("a", 2L, "DEL"), ("c", 2L, "c2"))
    q.processAllAvailable()
    q.stop()
    assert(store.read().select("k", "v").as[(String, String)].collect().toSet ==
      Set(("b", "b1"), ("c", "c2")))
  }
}
