package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[PreferencePairs]] — per-group chosen election + margin-gated,
  * capped rejected pairing. */
class PreferencePairsSpec extends SparkSuite {
  import spark.implicits._

  // group 1: scores 100, 90, 55, 10 — chosen 100; margin 40 admits 55
  //   (gap 45) and 10 (gap 90), NOT 90 (gap 10)
  // group 2: scores 70, 69 — nothing clears the margin -> no rows
  // group 3: singleton -> no rows (a chosen needs an opponent)
  private def fixture = Seq(
    (1L, 11L, 100L), (1L, 12L, 90L), (1L, 13L, 55L), (1L, 14L, 10L),
    (2L, 21L, 70L), (2L, 22L, 69L),
    (3L, 31L, 50L)
  ).toDF("grp", "id", "sc")

  private def run(margin: Long, cap: Int) =
    PreferencePairs.pairs(fixture, "grp", "id", col("sc"), margin, cap)
      .select("grp", "chosen_id", "rejected_id", "score_gap")
      .as[(Long, Long, Long, Long)].collect().toSet

  test("margin gates near-ties; groups without clearance emit nothing") {
    assert(run(margin = 40L, cap = 5) ==
      Set((1L, 11L, 13L, 45L), (1L, 11L, 14L, 90L)))
  }

  test("cap keeps the hardest negatives (lowest score first)") {
    assert(run(margin = 0L, cap = 1) ==
      Set((1L, 11L, 14L, 90L), (2L, 21L, 22L, 1L)),
    "cap=1 must keep the LOWEST-scored rejected per group")
  }

  test("chosen ties break on id; chosen never pairs with itself") {
    val tied = Seq((9L, 1L, 50L), (9L, 2L, 50L), (9L, 3L, 10L))
      .toDF("grp", "id", "sc")
    val got = PreferencePairs.pairs(tied, "grp", "id", col("sc"),
        margin = 0L, maxRejected = 5)
      .select("chosen_id", "rejected_id").as[(Long, Long)].collect().toSet
    // chosen = id 1 (score tie, lower id wins); id 2 is a zero-gap
    // rejected, id 3 a real one; no (1,1) self-pair
    assert(got == Set((1L, 2L), (1L, 3L)))
  }

  test("deterministic under repartitioning") {
    val big = (0L until 400L).map(i => (i / 4, i, (i * 37 + 11) % 97))
      .toDF("grp", "id", "sc")
    val a = PreferencePairs.pairs(big.repartition(1), "grp", "id",
      col("sc"), 10L, 2).orderBy("grp", "rejected_id").collect().toSeq
    val b = PreferencePairs.pairs(big.repartition(13), "grp", "id",
      col("sc"), 10L, 2).orderBy("grp", "rejected_id").collect().toSeq
    assert(a == b)
  }
}
