package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Gopher quality battery, temperature-based domain reweighting, corpus
  * snapshot diff. Load-bearing: per-rule attribution (each rule fails for
  * the right reason), α=1/2 quota arithmetic (small domains up-sampled,
  * quotas integer-exact), diff status classification on all four paths. */
class CurationOpsSpec extends SparkSuite {
  import spark.implicits._

  test("gopher battery: each rule falls for its own reason") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over a lazy dog while the calm cat" +
        " naps under an old oak tree today"),         // clean
      (2L, "ok go"),                                  // too short
      (3L, ("extraordinarily " * 60).trim),           // mean word len too big
      (4L, ("the " + "a " * 59).trim),                // duplicate ceiling
      (5L, ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 6).trim)
    ).toDF("doc_id", "text")                          // 5: no stopwords
    val out = GopherQuality.battery(docs, "doc_id", "text",
      minWords = 10L, maxMeanLen = 8L).cache()
    val byId = out.select("doc_id", "words_ok", "wlen_ok", "dup_ok",
      "stop_ok", "keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(byId(1L)._6, "clean doc must pass")
    assert(!byId(2L)._2 && !byId(2L)._6, "short doc fails words_ok")
    assert(!byId(3L)._3 && !byId(3L)._6, "long words fail wlen_ok")
    assert(!byId(4L)._4 && !byId(4L)._6, "repeated token fails dup_ok")
    assert(!byId(5L)._5 && !byId(5L)._6, "no stopwords fails stop_ok")
    out.unpersist()
  }

  test("temperatureTopK: sqrt shares up-sample small domains, quotas exact") {
    // big: 6400 rows of weight 1; small: 100 rows of weight 1.
    // proportional shares 98.5%/1.5%; sqrt shares 80/10+80... sqrt(6400)=80,
    // sqrt(100)=10 → quotas 90*80/90=80 and 90*10/90=10 of 90.
    val docs = ((1 to 6400).map(i => (i.toLong, "big", 1L)) ++
      (1 to 100).map(i => (10000L + i, "small", 1L)))
      .toDF("id", "domain", "w")
    val out = Sampling.temperatureTopK(docs, "domain", col("id"), col("w"),
      totalRows = 90L)
    val quotas = out.groupBy("domain").agg(count(lit(1)).as("n"),
      first("quota").as("q")).as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(quotas("big") == ((80L, 80L)))
    assert(quotas("small") == ((10L, 10L)))
    // deterministic under repartitioning
    val again = Sampling.temperatureTopK(docs.repartition(11), "domain",
      col("id"), col("w"), 90L).select("id").as[Long].collect().toSet
    assert(again == out.select("id").as[Long].collect().toSet)
  }

  test("dataCard rolls up counts, extremes, and quality passes per slice") {
    val docs = Seq(
      (1L, "s1", "the quick brown fox jumps over a lazy dog today", 48L),
      (2L, "s1", "ok", 2L),                       // fails minWords
      (3L, "s2", "a small dog and the old cat walk to town now", 44L)
    ).toDF("doc_id", "source", "text", "n_chars")
    val card = CorpusReport.dataCard(docs, "doc_id", "text", "n_chars",
      "source", minWords = 5L, maxMeanLen = 10L)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(card("s1") == (("s1", 2L, 11L, 50L, 2L, 48L, 1L)))
    assert(card("s2") == (("s2", 1L, 11L, 44L, 44L, 44L, 1L)))
  }

  test("corpus diff classifies added/removed/modified/unchanged") {
    val oldSnap = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val newSnap = Seq((2L, "beta"), (3L, "gamma CHANGED"), (4L, "delta"),
      (5L, "Beta")).toDF("doc_id", "text")
    val st = CorpusDiff.diff(oldSnap, newSnap, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(st == Map(1L -> "removed", 2L -> "unchanged", 3L -> "modified",
      4L -> "added", 5L -> "added"))
    val sum = CorpusDiff.summary(oldSnap, newSnap, "doc_id", "text")
      .as[(String, Long)].collect().toMap
    assert(sum == Map("removed" -> 1L, "unchanged" -> 1L, "modified" -> 1L,
      "added" -> 2L))
    // formatting-only rewrite is `unchanged` (normalized fingerprint)
    val fmt = CorpusDiff.diff(Seq((9L, "x  y")).toDF("doc_id", "text"),
      Seq((9L, " x y ")).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(fmt(9L) == "unchanged")
  }
}
