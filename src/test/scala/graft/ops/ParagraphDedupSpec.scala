package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ParagraphDedupSpec extends SparkSuite {
  import spark.implicits._

  private val sep = "\n\n"

  // Four docs; "BOILER PLATE" recurs in 1, 2 and 3 (first at (1, pos 1));
  // "alpha beta" recurs in 1 (pos 0) and 3 (pos 2); doc 4 is untouched;
  // doc 5 is ONLY duplicated units (fully excised); blank units keep
  // their slot but never participate.
  private def corpus = Seq(
    (1L, s"alpha beta${sep}BOILER PLATE${sep}unique one"),
    (2L, s"unique two${sep}${sep}BOILER PLATE"),
    (3L, s"unique three${sep}BOILER PLATE${sep}alpha beta"),
    (4L, "nothing shared here"),
    (5L, s"BOILER PLATE${sep}alpha beta")
  ).toDF("doc_id", "text")

  test("explodeUnits numbers original slots and drops blanks") {
    val u = ParagraphDedup.explodeUnits(corpus, "doc_id", "text")
    // doc 2's blank middle unit is absent but "BOILER PLATE" keeps pos 2
    assert(u.where($"doc_id" === 2L).as[(Long, Long, String)].collect()
      .toSet == Set((2L, 0L, "unique two"), (2L, 2L, "BOILER PLATE")))
    assert(u.count() == 11)
  }

  test("duplicated finds corpus-wide units with first-occurrence keeper") {
    val d = ParagraphDedup.duplicated(
      ParagraphDedup.explodeUnits(corpus, "doc_id", "text"), "doc_id")
      .collect().map(r => (r.getAs[Long]("n_docs"), r.getAs[Long]("n_copies"),
        r.getAs[Long]("keeper_id"), r.getAs[Long]("keeper_pos"))).toSet
    // BOILER PLATE: 4 docs, 4 copies, keeper (1,1); alpha beta: 3 docs,
    // 3 copies, keeper (1,0)
    assert(d == Set((4L, 4L, 1L, 1L), (3L, 3L, 1L, 0L)))
  }

  test("excise keeps first occurrence, passes untouched docs verbatim") {
    val out = ParagraphDedup.excise(corpus, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out(1L) == s"alpha beta${sep}BOILER PLATE${sep}unique one")
    assert(out(2L) == "unique two")
    assert(out(3L) == "unique three")
    // untouched doc keeps its exact original text
    assert(out(4L) == "nothing shared here")
    // fully-excised doc survives as an empty row, not a dropped one
    assert(out(5L) == "")
    assert(out.size == 5)
  }

  test("higher minCopies threshold narrows the duplicated set") {
    val d = ParagraphDedup.duplicated(
      ParagraphDedup.explodeUnits(corpus, "doc_id", "text"), "doc_id",
      minCopies = 4)
    assert(d.count() == 1) // only BOILER PLATE reaches 4 copies
  }
}
