package graft.ops

import java.nio.file.Files

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The persisted-LSH-index incremental dedup: any batch split of a corpus
  * must land on exactly the one-shot candidate pair set, with per-call
  * outputs disjoint (old–old pairs are never re-emitted). */
class IncrementalDedupSpec extends SparkSuite {
  import spark.implicits._

  // near-dup clusters (same 5-token boilerplate with one token varied) plus
  // unique documents; ids interleave so every batch split crosses clusters
  private def corpus() = {
    val boiler = "alpha beta gamma delta epsilon zeta eta theta"
    val docs =
      (1L to 6L).map(i => (i, s"$boiler variant$i")) ++
        (7L to 12L).map(i => (i, s"totally different prose number $i with unique words w$i x$i y$i z$i")) ++
        (13L to 16L).map(i => (i, s"$boiler variant${i - 12}")) // dups of 1..4
    docs.toDF("doc_id", "text")
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .as[(Long, Long)].collect().toSet

  test("incremental over any batch split equals the one-shot pair set; calls are disjoint") {
    val docs = corpus()
    val oneShot = pairSet(MinHashLsh.candidatePairs(docs, "doc_id", "text"))
    assert(oneShot.nonEmpty, "corpus must produce near-dup candidates")
    val dir = Files.createTempDirectory("lsh-idx").toFile.getAbsolutePath
    val idx = new MinHashIndex(spark, dir, "doc_id", "text")
    // three uneven batches
    val b1 = pairSet(idx.addAndFindPairs(docs.where(col("doc_id") <= 5)))
    val b2 = pairSet(idx.addAndFindPairs(
      docs.where(col("doc_id") > 5 && col("doc_id") <= 13)))
    val b3 = pairSet(idx.addAndFindPairs(docs.where(col("doc_id") > 13)))
    assert((b1 & b2).isEmpty && (b1 & b3).isEmpty && (b2 & b3).isEmpty,
      "calls must never re-emit a pair")
    assert((b1 ++ b2 ++ b3) == oneShot,
      s"incremental union diverged: missing ${oneShot -- b1 -- b2 -- b3}, " +
        s"extra ${(b1 ++ b2 ++ b3) -- oneShot}")
  }

  test("first call probes an empty index; a batch with no shingleable docs is a no-op") {
    val dir = Files.createTempDirectory("lsh-idx-empty").toFile.getAbsolutePath
    val idx = new MinHashIndex(spark, dir, "doc_id", "text")
    val docs = corpus()
    assert(pairSet(idx.addAndFindPairs(docs.where(col("doc_id") === 1))).isEmpty)
    // too short to shingle (k=3): contributes no postings, emits no pairs
    val short = Seq((99L, "tiny doc")).toDF("doc_id", "text")
    assert(pairSet(idx.addAndFindPairs(short)).isEmpty)
    // a duplicate of doc 1 arriving later still pairs against the index
    val dup = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta variant1"))
      .toDF("doc_id", "text")
    assert(pairSet(idx.addAndFindPairs(dup)) == Set((1L, 100L)))
    // crash-replay: the same batch again (its postings already landed) must
    // re-emit its pairs idempotently, never pair a doc with itself
    assert(pairSet(idx.addAndFindPairs(dup)) == Set((1L, 100L)))
  }

  test("the prefix width the index was created with wins over the constructor") {
    val docs = corpus()
    val dir = Files.createTempDirectory("lsh-idx-pfx").toFile.getAbsolutePath
    // created wide (2-char prefixes), reopened with the (narrower) default:
    // probes must still see the old postings — a width mismatch would
    // silently match nothing and drop every cross-batch pair
    val wide = new MinHashIndex(spark, dir, "doc_id", "text", prefixChars = 2)
    wide.addAndFindPairs(docs.where(col("doc_id") <= 5))
    val reopened = new MinHashIndex(spark, dir, "doc_id", "text")
    val pairs = pairSet(reopened.addAndFindPairs(docs.where(col("doc_id") === 13)))
    // 13 is a boilerplate variant: it buckets with ALL of 1..5, every one
    // parked by the wide index
    assert(pairs == (1L to 5L).map((_, 13L)).toSet,
      s"reopened index lost cross-batch pairs: $pairs")
  }
}
