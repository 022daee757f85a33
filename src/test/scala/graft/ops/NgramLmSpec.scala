package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[NgramLm.stupidBackoffFilter]] — every backoff branch pinned to its
  * hand-computed fixed-point value on a corpus small enough to count on
  * paper. Target slice (lang=en): "a b c a b d d" →
  * trigram counts {abc:1, bca:1, cab:1, abd:1, bdd:1},
  * bigram counts {ab:2, bc:1, ca:1, bd:1, dd:1},
  * unigram counts {a:2, b:2, c:1, d:2}, N=7. */
class NgramLmSpec extends SparkSuite {
  import spark.implicits._

  private def fp(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
  private val a = fp(math.log(0.4))

  test("stupid backoff: trigram hit, bigram backoff, unigram backoff, OOV") {
    val docs = Seq(
      (1L, "a b c a b d d", "en"), // the model slice, scored like the rest
      (2L, "a b c", "xx"),  // seen trigram: ln(c_abc/c_ctx) = ln(1/2)
      (3L, "b a b", "xx"),  // bigram backoff: α + ln(c_ab/c_a) = α + ln(2/2)
      (4L, "a c d", "xx"),  // unigram backoff: 2α + ln(c_d/N) = 2α + ln(2/7)
      (5L, "a b z", "xx"),  // OOV: 2α + ln(1/N)
      (6L, "a b", "xx"))    // < 3 tokens → zero triples, kept
      .toDF("doc_id", "text", "lang")
    val out = NgramLm.stupidBackoffFilter(docs, "doc_id", "text",
        col("lang") === "en", thresholdMilliNat = -1000L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Boolean)].collect().toSeq

    val expected = Seq(
      // doc 1: abc ln(1/2), bca 0, cab 0, abd ln(1/2), bdd 0
      (1L, 5L, 2 * fp(math.log(0.5)), true),
      (2L, 1L, fp(math.log(0.5)), true),
      (3L, 1L, a + fp(math.log(1.0)), true),
      (4L, 1L, 2 * a + fp(math.log(2.0 / 7.0)), false),
      (5L, 1L, 2 * a + fp(math.log(1.0 / 7.0)), false),
      (6L, 0L, 0L, true))
    assert(out == expected)
  }

  test("Kneser–Ney: seen text outscores OOV, probabilities strictly positive") {
    val docs = Seq(
      (1L, "the cat sat on the mat and the cat ran", "en"),
      (2L, "the cat sat", "xx"),       // all-seen trigram
      (3L, "zq xv qqq", "xx"),         // all-OOV: add-one continuation floor
      (4L, "a b", "xx"))               // < 3 tokens → kept with zero triples
      .toDF("doc_id", "text", "lang")
    val out = NgramLm.kneserNeyFilter(docs, "doc_id", "text",
        col("lang") === "en", thresholdMilliNat = -2000L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    val byId = out.map(r => r._1 -> r).toMap
    // every scored triple is a probability < 1 → strictly negative ll
    assert(out.filter(_._2 > 0).forall(_._3 < 0L))
    // per-triple mean: the seen trigram must beat the OOV floor
    def mean(r: (Long, Long, Long, Boolean)) = r._3.toDouble / r._2
    assert(mean(byId(2L)) > mean(byId(3L)),
      "a seen trigram must outscore the add-one continuation floor")
    assert(byId(2L)._4 && !byId(3L)._4,
      "threshold separates in-domain from OOV at -2 nats/triple")
    assert(byId(4L) == ((4L, 0L, 0L, true)))
  }

  test("bigram perplexityFilter unchanged: keeps in-domain, drops garbled") {
    val docs = Seq(
      (1L, "the cat sat on the mat", "en"),
      (2L, "the cat sat", "xx"),
      (3L, "zq xv qqq zzz vvv kkk", "xx"))
      .toDF("doc_id", "text", "lang")
    val out = NgramLm.perplexityFilter(docs, "doc_id", "text",
        col("lang") === "en", thresholdMilliNat = -1400L)
      .orderBy("doc_id").select("keep").as[Boolean].collect().toSeq
    assert(out(1), "in-domain transitions must clear the threshold")
    assert(!out(2), "all-unseen transitions must not")
  }

  test("perplexityBuckets: fluent docs land in the head, garbled in the tail") {
    val docs = Seq(
      (1L, "the cat sat on the mat", "en"),
      (2L, "the cat sat on the mat and the cat sat", "en"),
      (3L, "the dog sat on the mat", "en"),
      (4L, "zq xv qqq zzz vvv kkk", "en"),
      (5L, "mm nn oo pp qq rr", "en"),
      (6L, "the cat sat", "en"))
      .toDF("doc_id", "text", "lang")
    val out = NgramLm.perplexityBuckets(docs, "doc_id", "text", "lang",
        col("lang") === "en")
      .orderBy("bucket")
      .as[(String, Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(out.map(_._2) == Seq(1L, 2L, 3L), "three buckets")
    assert(out.map(_._3) == Seq(2L, 2L, 2L), "even tertile fill")
    // bucket ranges are ordered and non-overlapping
    assert(out(0)._5 <= out(1)._4 && out(1)._5 <= out(2)._4)
    assert(out.map(_._6) == Seq(true, true, false), "keep head+middle only")
  }

  test("perplexityBuckets sentinels scoreless docs into the tail") {
    val docs = Seq(
      (1L, "the cat sat on the mat", "en"),
      (2L, "the cat sat on a mat", "en"),
      (3L, "solo", "en")) // no transitions → sentinel key
      .toDF("doc_id", "text", "lang")
    val out = NgramLm.perplexityBuckets(docs, "doc_id", "text", "lang",
        col("lang") === "en")
      .orderBy("bucket")
      .as[(String, Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(out.last._4 == 1000000000000000L,
      "the scoreless doc is alone in the last bucket at the sentinel key")
  }
}
