package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Persisted exact-dedup fingerprint index: first-arrival keeper order,
  * batch-split invariance of the keeper SET, replay convergence, and
  * compaction. */
class ExactDedupIndexSpec extends SparkSuite {
  import spark.implicits._

  // ids 1-3 share content "dup one", 4-5 share "dup two", 6-7 unique;
  // fingerprint normalizes whitespace/case so 1 ≡ 2 ≡ 3 despite casing
  private def corpus = Seq(
    (1L, "dup one"), (2L, "Dup  One"), (3L, "dup one "),
    (4L, "dup two"), (5L, "DUP TWO"),
    (6L, "unique alpha"), (7L, "unique beta")
  ).toDF("id", "text")

  private def newIdx() = new ExactDedupIndex(spark,
    java.nio.file.Files.createTempDirectory("exidx").toFile.getAbsolutePath,
    "id", "text")

  test("keeper is the first arrival: earliest batch, then smallest id") {
    val idx = newIdx()
    // batch 1 carries ids 2,4,6 — so content "dup one" is first seen as 2
    val n1 = idx.addAndDedup(corpus.where(col("id").isin(2L, 4L, 6L)), 1L)
    assert(n1.select("id").as[Long].collect().toSet == Set(2L, 4L, 6L))
    val n2 = idx.addAndDedup(corpus.where(!col("id").isin(2L, 4L, 6L)), 2L)
    // batch 2's 1,3 (dup of 2) and 5 (dup of 4) are NOT novel
    assert(n2.select("id").as[Long].collect().toSet == Set(7L))
    val keep = idx.keepers().select("keeper_id").as[Long].collect().toSet
    assert(keep == Set(2L, 4L, 6L, 7L))
  }

  test("within a batch, duplicate content keeps the smallest id") {
    val idx = newIdx()
    idx.addAndDedup(corpus, 1L)
    assert(idx.keepers().select("keeper_id").as[Long].collect().toSet ==
      Set(1L, 4L, 6L, 7L))
  }

  test("same-ord replay returns the SAME novel set; keepers converge") {
    val idx = newIdx()
    val orig = idx.addAndDedup(corpus.where(col("id") <= 4), 1L)
      .select("id").as[Long].collect().toSet
    val before = idx.keepers().collect().toSet
    // crashed-append replay: the attempt's own appends (same ord) must
    // NOT mask the batch — a composed pipeline feeds downstream stores
    // from this return value, so replay has to re-deliver the batch
    val replay = idx.addAndDedup(corpus.where(col("id") <= 4), 1L)
      .select("id").as[Long].collect().toSet
    assert(replay == orig)
    // the re-appended rows are byte-identical; (ord, id) arbitration
    // keeps the keeper set fixed
    assert(idx.keepers().collect().toSet == before)
  }

  test("concurrent in-process appenders converge to the serial keepers") {
    // 8 threads race addAndDedup on ONE store — StoreLock's per-path
    // monitor serializes them (this is the in-JVM half of the
    // CrossProcessStoreSpec story; unserialized, the probe-then-append
    // calls would corrupt each other's committer staging)
    val dir = java.nio.file.Files
      .createTempDirectory("exidx-conc").toFile.getAbsolutePath
    val idx = new ExactDedupIndex(spark, dir, "id", "text")
    // half unique per batch, half from a shared pool — cross-thread dups
    val batches = (0 until 8).map { b =>
      (b, (0 until 10).map { j =>
        val id = b * 1000L + j
        (id, if (j % 2 == 0) s"unique b$b j$j" else s"pool ${(b + j) % 5}")
      }.toDF("id", "text"))
    }
    Fs.inParallel(batches, maxThreads = 8) { case (b, df) =>
      idx.addAndDedup(df, ord = b.toLong)
    }
    // serial baseline in ord order
    val ser = new ExactDedupIndex(spark, java.nio.file.Files
      .createTempDirectory("exidx-ser").toFile.getAbsolutePath, "id", "text")
    batches.foreach { case (b, df) => ser.addAndDedup(df, ord = b.toLong) }
    assert(idx.keepers().collect().toSet == ser.keepers().collect().toSet)
  }

  test("compact rewrites one file per partition, keepers unchanged") {
    val idx = newIdx()
    idx.addAndDedup(corpus.where(col("id") % 2 === 1), 1L)
    idx.addAndDedup(corpus.where(col("id") % 2 === 0), 2L)
    val before = idx.keepers().collect().toSet
    idx.compact()
    assert(idx.keepers().collect().toSet == before)
    val gen = new java.io.File(idx.currentGenerationPath.get)
    val parts = gen.listFiles().filter(_.getName.startsWith("fpp="))
    assert(parts.nonEmpty && parts.forall(
      _.listFiles().count(_.getName.endsWith(".parquet")) == 1))
    // appends keep working against the compacted generation
    val n = idx.addAndDedup(Seq((9L, "dup one"), (10L, "brand new"))
      .toDF("id", "text"), 3L)
    assert(n.select("id").as[Long].collect().toSet == Set(10L))
  }

  test("empty-index keepers fails loudly instead of returning nothing") {
    intercept[IllegalStateException](newIdx().keepers())
  }

  test("ord high-water: fresh-checkpoint footgun fails under strictOrd") {
    val dir = java.nio.file.Files
      .createTempDirectory("exidx-hwm").toFile.getAbsolutePath
    val idx = new ExactDedupIndex(spark, dir, "id", "text", strictOrd = true)
    idx.addAndDedup(corpus.where(col("id") <= 4), 5L)
    assert(idx.ordHighWater().contains(5L))
    // same-ord replay stays sanctioned under strict mode (crash replay)
    idx.addAndDedup(corpus.where(col("id") <= 4), 5L)
    // the footgun: a fresh checkpoint resets epoch ids below the stored
    // max — duplicates of stored content would read as novel and flip
    // keepers; strict mode fails LOUDLY instead
    val e = intercept[IllegalStateException](
      idx.addAndDedup(corpus.where(col("id") > 4), 1L))
    assert(e.getMessage.contains("high-water"))
    // the mark survives compaction (it lives in the store root)
    idx.compact()
    assert(idx.ordHighWater().contains(5L))
    intercept[IllegalStateException](
      idx.addAndDedup(corpus.where(col("id") > 4), 2L))
    // and appends above the mark proceed, advancing it
    idx.addAndDedup(corpus.where(col("id") > 4), 6L)
    assert(idx.ordHighWater().contains(6L))
  }

  test("ord high-water: late concurrent appender stays allowed by default") {
    // the default (advisory) mode: a below-high-water ord is legitimate
    // for a late CONCURRENT appender whose batch genuinely predates the
    // stored ones — it logs a warning but converges to the serial result
    val idx = newIdx()
    idx.addAndDedup(corpus.where(col("id").isin(1L, 6L)), 4L)
    // arrives late with a LOWER ord: content "dup one" under id 2 at ord
    // 2 predates the stored (4, 1) row, so the keeper flips to it — the
    // exact (ord, id) arbitration a serial run would produce
    idx.addAndDedup(corpus.where(col("id").isin(2L, 7L)), 2L)
    val ser = newIdx()
    ser.addAndDedup(corpus.where(col("id").isin(2L, 7L)), 2L)
    ser.addAndDedup(corpus.where(col("id").isin(1L, 6L)), 4L)
    assert(idx.keepers().collect().toSet == ser.keepers().collect().toSet)
    // the mark tracks the MAX ord seen, not the last append
    assert(idx.ordHighWater().contains(4L))
  }

  test("bloom path returns exactly what the plain path returns") {
    val plain = newIdx(); val fast = newIdx()
    for ((idx, bloom) <- Seq((plain, false), (fast, true))) {
      idx.addAndDedup(corpus.where(col("id").isin(2L, 4L, 6L)), 1L, bloom)
      idx.addAndDedup(corpus.where(!col("id").isin(2L, 4L, 6L)), 2L, bloom)
    }
    assert(fast.keepers().collect().toSet == plain.keepers().collect().toSet)
    // replay convergence holds on the bloom path too: the crashed
    // attempt's bits route every fp through the exact anti-join, which
    // masks only ord<2 rows — so the ord-2 novel set comes back intact
    val replay = fast.addAndDedup(corpus, 2L, bloom = true)
    assert(replay.select("id").as[Long].collect().toSet == Set(7L))
    assert(fast.keepers().collect().toSet == plain.keepers().collect().toSet)
  }

  test("bloom bits backfill when enabled on a store populated without them") {
    val idx = newIdx()
    idx.addAndDedup(corpus.where(col("id") <= 5), 1L) // no bloom: no bits
    // first bloom call must backfill bits over the WHOLE store, or stored
    // content would read as novel on the next call
    idx.addAndDedup(corpus.where(col("id") === 6L), 2L, bloom = true)
    val n = idx.addAndDedup(corpus, 3L, bloom = true)
    assert(n.select("id").as[Long].collect().toSet == Set(7L))
    assert(idx.keepers().select("keeper_id").as[Long].collect().toSet ==
      Set(1L, 4L, 6L, 7L))
  }

  test("compact rewrites minimal bits; bloom appends keep working after") {
    val idx = newIdx()
    idx.addAndDedup(corpus.where(col("id") % 2 === 1), 1L, bloom = true)
    idx.addAndDedup(corpus.where(col("id") % 2 === 0), 2L, bloom = true)
    idx.compact()
    val gen = new java.io.File(idx.currentGenerationPath.get)
    assert(new java.io.File(gen, "_bloom").exists(),
      "compact must carry bits into the new generation")
    val n = idx.addAndDedup(Seq((9L, "dup one"), (10L, "brand new"))
      .toDF("id", "text"), 3L, bloom = true)
    assert(n.select("id").as[Long].collect().toSet == Set(10L))
  }
}
