package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ParagraphIndexSpec extends SparkSuite {
  import spark.implicits._

  private val sep = "\n\n"

  private def freshDir() = java.nio.file.Files
    .createTempDirectory("graft-para-idx").toFile.getAbsolutePath

  // batch 1 (ids 1-3) and batch 2 (ids 4-6); BOILER recurs everywhere,
  // "alpha beta" within batch 1 and again in batch 2, "late dup" only
  // within batch 2
  private def b1 = Seq(
    (1L, s"alpha beta${sep}BOILER PLATE${sep}one"),
    (2L, s"two${sep}BOILER PLATE"),
    (3L, s"alpha beta${sep}three")
  ).toDF("doc_id", "text")
  private def b2 = Seq(
    (4L, s"late dup${sep}BOILER PLATE${sep}four"),
    (5L, s"late dup${sep}alpha beta"),
    (6L, "six only")
  ).toDF("doc_id", "text")

  private def asMap(df: DataFrame) =
    df.select("doc_id", "text").as[(Long, String)].collect().toMap

  test("incremental over ordered batches equals the one-shot excision") {
    val idx = new ParagraphIndex(spark, freshDir(), "doc_id", "text")
    val out = asMap(idx.addAndExcise(b1, 0)) ++ asMap(idx.addAndExcise(b2, 1))
    val oneShot = asMap(
      ParagraphDedup.excise(b1.unionByName(b2), "doc_id", "text"))
    assert(out == oneShot)
    // spot-check the cross-batch drop: batch-2's BOILER occurrence gone
    assert(out(4L) == s"late dup${sep}four")
    // doc 5 loses BOTH units (late dup kept at (4,0), alpha beta at (1,0))
    assert(out(5L) == "")
  }

  test("cross-batch: a unit unique in batch 1 drops from batch 2") {
    val idx = new ParagraphIndex(spark, freshDir(), "doc_id", "text")
    idx.addAndExcise(b1, 0)
    val out2 = asMap(idx.addAndExcise(b2, 1))
    // "alpha beta" was kept at (1,0) in batch 1, "late dup" at (4,0)
    // within this batch → doc 5 loses both
    assert(out2(5L) == "")
    assert(out2(4L) == s"late dup${sep}four")
    assert(out2(6L) == "six only")
  }

  test("replayed append converges: same excision, one keeper per unit") {
    val idx = new ParagraphIndex(spark, freshDir(), "doc_id", "text")
    idx.addAndExcise(b1, 0)
    val once = asMap(idx.addAndExcise(b2, 1))
    val again = asMap(idx.addAndExcise(b2, 1)) // crash replay
    assert(again == once)
    val k = idx.keepers()
    assert(k.groupBy("ph").count().where(col("count") > 1).count() == 0)
  }

  test("compact arbitrates and preserves keepers; excision unchanged after") {
    val idx = new ParagraphIndex(spark, freshDir(), "doc_id", "text")
    idx.addAndExcise(b1, 0)
    idx.addAndExcise(b2, 1)
    val before = idx.keepers().as[(String, Long, Long)].collect().toSet
    idx.compact()
    val after = idx.keepers().as[(String, Long, Long)].collect().toSet
    assert(after == before)
    // a third batch repeating old boilerplate still excises against the
    // compacted store
    val b3 = Seq((7L, s"BOILER PLATE${sep}seven")).toDF("doc_id", "text")
    assert(asMap(idx.addAndExcise(b3, 2))(7L) == "seven")
  }
}
