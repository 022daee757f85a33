package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** [[FilterCascade]] — mask semantics, null-predicate safety, attrition
  * accounting, and the keepExpr/battery no-drift contract. */
class FilterCascadeSpec extends SparkSuite {
  import spark.implicits._

  test("keepExpr equals battery(...)('keep') on the real corpus — no drift") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val viaBattery = GopherQuality.battery(docs, "doc_id", "text",
      minWords = 30L, maxMeanLen = 5L, maxDupNum = 3L, maxDupDen = 5L)
      .select(col("doc_id"), col("keep"))
    val viaExpr = docs.select(col("doc_id"),
      GopherQuality.keepExpr(col("text"),
        minWords = 30L, maxMeanLen = 5L, maxDupNum = 3L, maxDupDen = 5L)
        .as("keep2"))
    val diff = viaBattery.join(viaExpr, "doc_id")
      .where(col("keep") =!= col("keep2"))
    assert(diff.count() == 0, "keepExpr diverged from the battery")
  }

  test("mask bits follow rule order; keep iff no bit set") {
    val docs = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("doc_id", "text")
    val out = FilterCascade.decide(docs, "doc_id", Seq(
        "always" -> lit(true),
        "only1" -> (col("doc_id") === 1L),
        "not3" -> (col("doc_id") =!= 3L)))
      .orderBy("doc_id").collect()
    // doc 1: all pass → 0; doc 2: fails only1 → bit 1; doc 3: fails
    // only1 + not3 → bits 1|2 = 6
    assert(out.toSeq == Seq(Row(1L, 0L, true), Row(2L, 2L, false),
      Row(3L, 6L, false)))
  }

  test("a null predicate is a failure, never a silent admit") {
    val docs = Seq((1L, java.lang.Long.valueOf(5L)),
      (2L, null.asInstanceOf[java.lang.Long])).toDF("doc_id", "v")
    val out = FilterCascade.decide(docs, "doc_id",
        Seq("vpos" -> (col("v") > 0L)))
      .orderBy("doc_id").collect()
    assert(out.toSeq == Seq(Row(1L, 0L, true), Row(2L, 1L, false)))
  }

  test("attrition counts overlap and survivors") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("doc_id", "text")
    val decided = FilterCascade.decide(docs, "doc_id", Seq(
      "even" -> (col("doc_id") % 2 === 0),
      "small" -> (col("doc_id") <= 2)))
    val r = FilterCascade.attrition(decided, Seq("even", "small")).collect()
    // fails even: 1,3; fails small: 3,4; keep: 2
    assert(r.toSeq == Seq(Row(4L, 2L, 2L, 1L)))
  }
}
