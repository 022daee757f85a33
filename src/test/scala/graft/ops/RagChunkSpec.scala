package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** [[RagChunk]] — overlapping sliding-window chunking: boundaries, tail
  * rules, full coverage, and the no-shuffle plan contract. */
class RagChunkSpec extends SparkSuite {
  import spark.implicits._

  private def doc(id: Long, n: Int) =
    (id, (0 until n).map(i => s"t$i").mkString(" "))

  test("chunk boundaries: starts step by stride, tail kept only if it adds content") {
    // 10 tokens, window 4, stride 3 → starts 0,3,6,9; start 9 adds only
    // 1 token ≤ window-stride=1 past start 6's end? n-s = 1, rule keeps
    // s iff s==0 or n-s > 1 → 9 dropped
    val out = RagChunk.chunks(Seq(doc(1L, 10)).toDF("doc_id", "text"),
      "doc_id", "text", window = 4, stride = 3)
      .orderBy("chunk_idx").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).toSeq ==
      Seq((0L, 0L, 4), (1L, 3L, 4), (2L, 6L, 4)))
    assert(out.head.getString(4) == "t0 t1 t2 t3")
    assert(out.last.getString(4) == "t6 t7 t8 t9")
  }

  test("short document yields exactly one full-copy chunk") {
    val out = RagChunk.chunks(Seq(doc(1L, 5)).toDF("doc_id", "text"),
      "doc_id", "text", window = 32, stride = 24).collect()
    assert(out.toSeq == Seq(Row(1L, 0L, 0L, 5, "t0 t1 t2 t3 t4")))
  }

  test("every token appears in at least one chunk; neighbors overlap by window-stride") {
    val n = 100
    val chunks = RagChunk.chunks(Seq(doc(7L, n)).toDF("doc_id", "text"),
      "doc_id", "text", window = 32, stride = 24)
      .orderBy("chunk_idx")
      .select("start_tok", "n_tok").as[(Long, Int)].collect()
    // coverage: union of [start, start+n_tok) is [0, n)
    val covered = chunks.flatMap { case (s, w) => s until s + w }.toSet
    assert(covered == (0L until n.toLong).toSet)
    // overlap: next chunk starts window-stride=8 tokens before prev end
    chunks.sliding(2).foreach {
      case Array((s1, w1), (s2, _)) => assert(s1 + w1 - s2 == 8)
      case _ =>
    }
  }

  test("tail shorter than a stride still surfaces when it adds content") {
    // 30 tokens, window 8, stride 8 (no overlap): starts 0,8,16,24;
    // 24 has n-s=6 > 0 → kept with 6 tokens
    val out = RagChunk.chunks(Seq(doc(1L, 30)).toDF("doc_id", "text"),
      "doc_id", "text", window = 8, stride = 8)
      .orderBy("chunk_idx").select("start_tok", "n_tok")
      .as[(Long, Int)].collect()
    assert(out.toSeq == Seq((0L, 8), (8L, 8), (16L, 8), (24L, 6)))
  }

  test("plan: chunking is scan-stage only — no Exchange anywhere") {
    val df = RagChunk.chunks(Seq(doc(1L, 50), doc(2L, 10)).toDF("doc_id", "text"),
      "doc_id", "text", window = 32, stride = 24)
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("Exchange"), s"unexpected shuffle in:\n$phys")
  }
}
