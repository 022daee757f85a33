package graft.ops

import graft.SparkSuite

class BlocklistSpec extends SparkSuite {
  import spark.implicits._

  test("blocklist matches word-boundary exact, single and multi-word") {
    val docs = Seq(
      (1L, "clean text here"),
      (2L, "contains badword in it"),
      (3L, "notbadword is a different token"),
      (4L, "a very bad phrase appears"),
      (5L, "badword and very bad phrase both"),
      (6L, "badword"), // entire text = the phrase (padding covers edges)
      (7L, "ends with badword")
    ).toDF("doc_id", "text")
    val out = Blocklist.screen(docs, "doc_id", "text",
      Seq("badword", "very bad phrase"))
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == (0L, true))
    assert(out(2L) == (1L, false))
    assert(out(3L) == (0L, true), "substring of a longer token must NOT match")
    assert(out(4L) == (1L, false))
    assert(out(5L) == (2L, false))
    assert(out(6L) == (1L, false))
    assert(out(7L) == (1L, false))
  }
}
