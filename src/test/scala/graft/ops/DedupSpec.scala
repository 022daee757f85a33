package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** A5 fixture: injected duplicates and reordering within a producer. */
class DedupSpec extends SparkSuite {
  import spark.implicits._

  test("byProducerSeq keeps exactly one row per (producer, seq)") {
    val df = Seq(
      ("p1", 1L, "a", 100L), ("p1", 2L, "b", 101L),
      ("p1", 2L, "b-redelivered", 105L), // duplicate seq, later offset
      ("p1", 1L, "a-redelivered", 106L),
      ("p2", 1L, "x", 102L)
    ).toDF("producer_name", "sequence_id", "value", "offset")
    // first-accepted wins = min offset: prefer negated offset in max_by
    val out = Dedup.byProducerSeq(df, "producer_name", "sequence_id",
      col("offset") * -1).as[(String, Long, String, Long)].collect()
    assert(out.length == 3)
    assert(out.toSet == Set(("p1", 1L, "a", 100L), ("p1", 2L, "b", 101L),
      ("p2", 1L, "x", 102L)))
  }

  test("exactByContent keeps first-seen row per distinct content") {
    val df = Seq(
      (1L, "hello world"), (2L, "unique text"), (3L, "hello world"),
      (4L, "hello world")
    ).toDF("id", "text")
    val out = Dedup.exactByContent(df, Seq("text"), col("id"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L))
  }

  test("exactSummary reports keeper and copy counts") {
    val df = Seq((1L, "dup"), (2L, "dup"), (3L, "solo")).toDF("doc_id", "text")
    val out = Dedup.exactSummary(df, Seq("text"), "doc_id")
      .select("keeper_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (3L, 1L)))
  }
}
