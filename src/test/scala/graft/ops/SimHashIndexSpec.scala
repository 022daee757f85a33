package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[SimHashIndex]] — persisted incremental SimHash near-dup flagging. */
class SimHashIndexSpec extends SparkSuite {
  import spark.implicits._

  private def freshDir() = java.nio.file.Files
    .createTempDirectory("graft-simhash-idx").toFile.getAbsolutePath

  // docs 1/2 identical text (hamming 0); 3 unrelated; 4 (batch 2) equals
  // 1 again; 5 unrelated to everything
  private def b1 = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),
    (3L, "completely different content about spark plans"))
    .toDF("doc_id", "text")
  private def b2 = Seq(
    (4L, "the quick brown fox jumps over the lazy dog"),
    (5L, "yet another unrelated document entirely"))
    .toDF("doc_id", "text")

  private def verdicts(df: DataFrame) =
    df.select("doc_id", "is_dup").as[(Long, Boolean)].collect().toMap

  test("batch-internal and cross-batch dups flag with the earliest keeper") {
    val idx = new SimHashIndex(spark, freshDir(), "doc_id")
    val v1 = idx.addAndDedup(b1, "text", ord = 0)
    assert(verdicts(v1) == Map(1L -> false, 2L -> true, 3L -> false))
    assert(v1.where($"doc_id" === 2L).select("keeper")
      .as[Long].head() == 1L)
    val v2 = idx.addAndDedup(b2, "text", ord = 1)
    assert(verdicts(v2) == Map(4L -> true, 5L -> false))
    assert(v2.where($"doc_id" === 4L).select("keeper")
      .as[Long].head() == 1L, "keeper is the batch-1 original")
  }

  test("replayed batch returns identical verdicts and does not grow the store") {
    val dir = freshDir()
    val idx = new SimHashIndex(spark, dir, "doc_id")
    idx.addAndDedup(b1, "text", ord = 0)
    val first = verdicts(idx.addAndDedup(b2, "text", ord = 1))
    val rows = spark.read.parquet(idx.currentGenerationPath.get).count()
    val replay = verdicts(idx.addAndDedup(b2, "text", ord = 1))
    assert(replay == first, "crash replay must not change verdicts")
    val rowsAfter = spark.read.parquet(idx.currentGenerationPath.get).count()
    assert(rowsAfter == rows, "replayed append must be a no-op")
  }

  test("compact preserves probe results and collapses to one live generation") {
    val dir = freshDir()
    val idx = new SimHashIndex(spark, dir, "doc_id")
    idx.addAndDedup(b1, "text", ord = 0)
    idx.compact()
    val v2 = verdicts(idx.addAndDedup(b2, "text", ord = 1))
    assert(v2 == Map(4L -> true, 5L -> false))
  }

  test("flagged docs are indexed too: a doc matching only an earlier dup still flags") {
    val dir = freshDir()
    val idx = new SimHashIndex(spark, dir, "doc_id")
    idx.addAndDedup(b1, "text", ord = 0) // 1 novel, 2 dup-of-1
    // doc 6 matches the fingerprint both 1 and 2 hold; keeper = min = 1,
    // and the store holds postings for 1 AND 2 (detection semantics)
    val v = idx.addAndDedup(
      Seq((6L, "the quick brown fox jumps over the lazy dog"))
        .toDF("doc_id", "text"), "text", ord = 1)
    assert(verdicts(v) == Map(6L -> true))
    val ids = spark.read.parquet(idx.currentGenerationPath.get)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 3L, 6L), "every doc is indexed, dup or not")
  }

  test("ordered batches equal the one-shot exists-earlier model") {
    val docs = Seq(
      (10L, "alpha bravo charlie delta echo foxtrot"),
      (11L, "alpha bravo charlie delta echo foxtrot"),
      (12L, "spark catalyst tungsten codegen stages"),
      (13L, "alpha bravo charlie delta echo foxtrot"),
      (14L, "spark catalyst tungsten codegen stages"),
      (15L, "totally fresh words never seen before"))
    val all = docs.toDF("doc_id", "text")
    // one-shot model: dup iff any qualifying pair links to a smaller id
    val model = SimHashDedup.nearDuplicates(all, "doc_id", "text")
      .select("doc_b").as[Long].collect().toSet
    val idx = new SimHashIndex(spark, freshDir(), "doc_id")
    val got = (verdicts(idx.addAndDedup(
      docs.take(3).toDF("doc_id", "text"), "text", 0)) ++
      verdicts(idx.addAndDedup(
        docs.drop(3).toDF("doc_id", "text"), "text", 1)))
    assert(got == docs.map(d => d._1 -> model.contains(d._1)).toMap)
  }

  test("probe planning prunes partitions: bucket filter reaches the scan") {
    val dir = freshDir()
    val idx = new SimHashIndex(spark, dir, "doc_id")
    idx.addAndDedup(b1, "text", ord = 0)
    // the store exists and is partitioned by pb
    val gen = new java.io.File(idx.currentGenerationPath.get)
    val parts = gen.listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(parts.sameElements(Array("pb=b0", "pb=b1")),
      s"expected block partitions, got ${parts.mkString(",")}")
  }
}
