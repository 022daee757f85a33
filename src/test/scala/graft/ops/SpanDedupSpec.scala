package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Exact substring-span dedup: the winnowing-anchored discovery must find
  * every shared token run ≥ minTokens with exact boundaries, and the
  * excision step must merge per-doc cuts into disjoint intervals. */
class SpanDedupSpec extends SparkSuite {
  import spark.implicits._

  private def spans(docs: Seq[(Long, String)], minTokens: Int = 8) =
    SpanDedup.sharedSpans(docs.toDF("doc_id", "text"), "doc_id", "text",
      minTokens = minTokens, k = 5, w = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  test("a planted shared passage is recovered with exact boundaries") {
    val passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val a = s"one two three $passage four five"
    val b = s"$passage six seven eight nine ten eleven"
    // 10-token passage: a positions 4..13, b positions 1..10
    assert(spans(Seq(1L -> a, 2L -> b)) == Set((1L, 2L, 4L, 1L, 10L)))
  }

  test("runs shorter than minTokens are not reported") {
    val short7 = "alpha beta gamma delta epsilon zeta eta"
    val a = s"$short7 x1 x2 x3"
    val b = s"y1 y2 $short7 y3"
    assert(spans(Seq(1L -> a, 2L -> b), minTokens = 8).isEmpty)
    // at minTokens = 7 the same run IS found (guarantee threshold k+w-1 = 7)
    assert(spans(Seq(1L -> a, 2L -> b), minTokens = 7) ==
      Set((1L, 2L, 1L, 3L, 7L)))
  }

  test("two disjoint shared runs on the same diagonal both surface") {
    val r1 = "a1 a2 a3 a4 a5 a6 a7 a8"
    val r2 = "b1 b2 b3 b4 b5 b6 b7 b8"
    val a = s"$r1 MID $r2"
    val b = s"$r1 DIF $r2"
    // identical prefixes/suffixes around a 1-token mismatch at position 9
    assert(spans(Seq(1L -> a, 2L -> b)) ==
      Set((1L, 2L, 1L, 1L, 8L), (1L, 2L, 10L, 10L, 8L)))
  }

  test("maximality: a longer shared run is one span, not fragments") {
    val long = (1 to 20).map(i => s"t$i").mkString(" ")
    val a = s"head1 head2 $long"
    val b = s"$long tail1"
    assert(spans(Seq(1L -> a, 2L -> b)) == Set((1L, 2L, 3L, 1L, 20L)))
  }

  test("internal repetition within one doc is not a pair") {
    val p = "alpha beta gamma delta epsilon zeta eta theta"
    assert(spans(Seq(1L -> s"$p $p")).isEmpty)
  }

  test("excisions cut from the larger doc and merge overlapping cuts") {
    val p1 = "alpha beta gamma delta epsilon zeta eta theta"
    val p2 = "iota kappa lambda mu nu xi omicron pi"
    // doc 3 carries p1 (from doc 1) at 1..8 and p2 (from doc 2) at 9..16 —
    // adjacent cuts must merge into one interval
    val docs = Seq(
      1L -> s"$p1 u1 u2",
      2L -> s"v1 $p2",
      3L -> s"$p1 $p2 w1")
    val s = SpanDedup.sharedSpans(docs.toDF("doc_id", "text"),
      "doc_id", "text", minTokens = 8, k = 5, w = 3)
    val cuts = SpanDedup.excisions(s)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(cuts == Set((3L, 1L, 16L, 16L)))
  }

  test("hot-fingerprint star cap keeps excision-relevant coverage") {
    val boiler = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"
    val docs = (1L to 12L).map(i => i -> s"u${i}a u${i}b $boiler u${i}c")
    val s = SpanDedup.sharedSpans(docs.toDF("doc_id", "text"),
      "doc_id", "text", minTokens = 8, k = 5, w = 3, maxPostings = 4)
    // the pair list is thinned (star), but every doc except the hub still
    // appears as doc_b with the boilerplate span located exactly
    val cutDocs = s.select("doc_b").as[Long].collect().toSet
    assert(cutDocs == (2L to 12L).toSet)
    val perDoc = s.groupBy("doc_b").agg(min("b_start").as("s"))
      .as[(Long, Long)].collect().toMap
    assert(perDoc.values.forall(_ == 3L))
  }

  test("plan: one hash shuffle for the postings group, no nested-loop join") {
    val docs = (1L to 50L).map(i => i -> s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f")
    val plan = SpanDedup.sharedSpans(docs.toDF("doc_id", "text"),
      "doc_id", "text").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
  test("crossSpans finds an eval passage quoted mid-document and pairs " +
    "only across corpora") {
    val quote = "alpha beta gamma delta epsilon zeta eta theta iota"
    val test = Seq(1L -> s"prompt start $quote prompt end")
    val train = Seq(
      1L -> s"t1 t2 t3 t4 $quote t5 t6",  // equal id: different corpus, real hit
      7L -> s"u1 $quote u2",
      9L -> "unrelated text with nothing shared here at all ok")
    val got = SpanDedup.crossSpans(train.toDF("doc_id", "text"),
      test.toDF("doc_id", "text"), "doc_id", "text",
      minTokens = 8, k = 5, w = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // 9-token quote at test pos 3..11; train 1 pos 5..13; train 7 pos 2..10
    assert(got == Set((1L, 1L, 3L, 5L, 9L), (1L, 7L, 3L, 2L, 9L)))
  }

  test("crossSpans star cap keeps every contaminated test doc flagged") {
    val boiler = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"
    val test = (1L to 6L).map(i => i -> s"q${i}a $boiler q${i}b")
    val train = (100L to 120L).map(i => i -> s"w${i}a w${i}b $boiler")
    val got = SpanDedup.crossSpans(train.toDF("doc_id", "text"),
      test.toDF("doc_id", "text"), "doc_id", "text",
      minTokens = 8, k = 5, w = 3, maxBucket = 4)
      .as[(Long, Long, Long, Long, Long)].collect()
    // pair list is thinned to the hub train doc, but every test doc is
    // still flagged with its exact span
    assert(got.map(_._1).toSet == (1L to 6L).toSet)
    assert(got.forall(r => r._3 == 2L && r._5 == 10L))
  }
}
