package graft.ops

import graft.SparkSuite

class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  private def left = Seq(
    // (id, key, t)
    (1L, "a", 100L), (2L, "a", 250L), (3L, "b", 50L), (4L, "c", 500L)
  ).toDF("id", "k", "t")

  private def right = Seq(
    // (rid, key, rt, payload)
    (10L, "a", 100L, "a@100"), (11L, "a", 200L, "a@200"),
    (12L, "b", 60L, "b@60"), (13L, "c", 400L, "c@400"),
    (14L, "c", 400L, "c@400-later") // same instant: tie-break by rid
  ).toDF("rid", "rk", "rt", "payload")

  test("asOf picks most recent right row at or before left time") {
    val out = AsOfJoin.asOf(left, Seq("k"), "t", right, Seq("rk"), "rt",
      rightTieBreak = Seq("rid"), joinType = "inner")
      .select("id", "payload").as[(Long, String)].collect().toMap
    assert(out == Map(
      1L -> "a@100",        // inclusive: rt == t matches
      2L -> "a@200",        // latest of the two
      4L -> "c@400-later")) // simultaneous rights: max rid wins
    // id=3 (b@50): only right row is at 60 > 50 → dropped under inner
  }

  test("asOf left join keeps unmatched left rows with nulls") {
    val out = AsOfJoin.asOf(left, Seq("k"), "t", right, Seq("rk"), "rt",
      rightTieBreak = Seq("rid"), joinType = "left")
      .select("id", "payload").as[(Long, Option[String])].collect().toMap
    assert(out(3L).isEmpty && out.size == 4)
  }
}
