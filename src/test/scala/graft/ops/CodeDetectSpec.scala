package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[CodeDetect]] — integer-density code-vs-prose routing. */
class CodeDetectSpec extends SparkSuite {
  import spark.implicits._

  test("code snippets route to code; prose stays prose") {
    val docs = Seq(
      (1L, "def add(a, b): { return a + b; } const x = add(1, 2);"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "import os; import sys; def main(): return 0"),
      // an isolated ambiguous keyword ("class") in prose of realistic
      // length stays under the 5% density bar — the reason the verdict
      // is a DENSITY, not a hit test
      (4L, "we discussed the class schedule over coffee yesterday " +
        "and planned the spring semester reading group meetings " +
        "before walking back across the quiet campus lawn"))
      .toDF("doc_id", "t")
    val out = CodeDetect.withVerdict(docs, "t", charPct = 2L, tokPct = 5L)
      .orderBy("doc_id").select("is_code").as[Boolean].collect().toSeq
    assert(out == Seq(true, false, true, false))
  }

  test("signals count exactly: symbols via translate, keywords whole-token") {
    val docs = Seq((1L, "def f(x) { return x; } xdef deff")).toDF("doc_id", "t")
    val r = CodeDetect.withVerdict(docs, "t", 2L, 5L)
      .select("n_code_chars", "n_code_tokens")
      .as[(Long, Long)].collect().head
    // symbols: ( ) { ; } = 5; keywords: def, return (xdef/deff are not)
    assert(r == ((5L, 2L)))
  }

  test("verdict is a pure projection: zero exchanges") {
    val docs = Seq((1L, "x")).toDF("doc_id", "t")
    val p = CodeDetect.withVerdict(docs, "t", 2L, 5L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"unexpected shuffle:\n$p")
  }
}
