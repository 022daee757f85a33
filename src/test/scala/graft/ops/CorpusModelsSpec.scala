package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Collocations (PMI), Naive Bayes classification, and DSIR importance
  * selection — the corpus-statistics/model operators. Load-bearing
  * properties: fixed-point scores are exact integers (partition-order
  * independent), argmax/selection is total-ordered, and hand-computed
  * small-corpus values reproduce. */
class CorpusModelsSpec extends SparkSuite {
  import spark.implicits._

  private def fp(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong

  test("pmiBigrams: counts and fixed-point PMI match hand computation") {
    // "a b" 3×, "c d" 1× (below minCount), unigrams a:3 b:4 c:1 d:1
    val docs = Seq("a b a b", "a b b c d").toDF("text")
    val out = Collocations.pmiBigrams(docs, "text", minCount = 2)
      .as[(String, String, Long, Long)].collect()
      .map { case (w1, w2, n, p) => ((w1, w2), (n, p)) }.toMap
    // bigram slots: (a,b)(b,a)(a,b) + (a,b)(b,b)(b,c)(c,d) = 7 total;
    // only (a,b) reaches minCount=2
    assert(out.keySet == Set(("a", "b")))
    val (nAb, pmiAb) = out(("a", "b"))
    assert(nAb == 3L)
    // pmi = ln((3/7) / ((3/9)*(4/9)))
    assert(pmiAb == fp(math.log((3.0 / 7.0) / ((3.0 / 9.0) * (4.0 / 9.0)))))
    assert(!out.contains(("c", "d"))) // minCount floor
  }

  test("pmiBigrams is partition-order independent") {
    val docs = (1 to 200).map(i => s"w${i % 7} w${i % 5} w${i % 7}")
      .toDF("text")
    val a = Collocations.pmiBigrams(docs, "text", 2).collect().toSet
    val b = Collocations.pmiBigrams(docs.repartition(13), "text", 2)
      .collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("NaiveBayes separates classes and breaks ties deterministically") {
    // train (even ids): class A says only "x", class B only "y"
    val docs = Seq(
      (0L, "A", "x x x"), (2L, "A", "x x"), (4L, "B", "y y y"),
      (6L, "B", "y y"),
      // test (odd ids): clear A, clear B, and an empty doc (prior-only)
      (1L, "A", "x x y"), (3L, "B", "y y x"), (5L, "A", "")
    ).toDF("id", "lab", "text")
    val out = NaiveBayes.classify(docs, "id", "text", "lab",
      col("id") % 2 === 0)
      .as[(Long, String, String, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L)._2 == "A" && out(3L)._2 == "B")
    // empty doc: equal priors (2 docs each) → tie broken to min class "A"
    assert(out(5L)._2 == "A")
    assert(out(5L)._3 == fp(math.log(2.0 / 4.0))) // prior only, ll = 0
    // hand-check doc 1: vocab {x,y}, A: 5 x's → p(x|A)=(5+1)/(5+2),
    // p(y|A)=1/7; B: p(x|B)=1/7, p(y|B)=6/7
    val scoreA = fp(math.log(2.0 / 4.0)) +
      2 * fp(math.log(6.0 / 7.0)) + fp(math.log(1.0 / 7.0))
    assert(out(1L)._3 == scoreA)
  }

  test("NaiveBayes scores are exact under repartitioning") {
    val docs = (1 to 400).map { i =>
      (i.toLong, s"c${i % 3}", (0 to i % 11).map(j => s"w${(i + j) % 13}")
        .mkString(" "))
    }.toDF("id", "lab", "text")
    val a = NaiveBayes.classify(docs, "id", "text", "lab",
      col("id") % 2 === 0).collect().toSet
    val b = NaiveBayes.classify(docs.repartition(17), "id", "text", "lab",
      col("id") % 2 === 0).collect().toSet
    assert(a == b && a.size == 200)
  }

  test("Dsir ranks target-looking documents above raw-looking ones") {
    // target (ids 1-10) speaks "t"; raw background (ids 11-40) speaks "r";
    // probes (ids 41-42): one t-heavy, one r-heavy
    val docs = ((1 to 10).map(i => (i.toLong, true, "t t t t")) ++
      (11 to 40).map(i => (i.toLong, false, "r r r r")) ++
      Seq((41L, false, "t t t r"), (42L, false, "r r r t")))
      .toDF("id", "tgt", "text")
    val w = Dsir.importanceWeights(docs, "id", "text", col("tgt"))
      .as[(Long, Long)].collect().toMap
    assert(w(41L) > w(42L)) // more target-mass tokens → higher weight
    assert(w(1L) > w(11L))  // pure target beats pure background
    val top = Dsir.selectTopN(docs, "id", "text", col("tgt"), 12)
      .as[(Long, Long)].collect()
    assert(top.length == 12)
    // selection is (weight desc, id) total-ordered: the 10 target docs and
    // the t-heavy probe lead; all pure-target docs tie and sort by id
    assert(top.map(_._1).take(10).sameElements(1L to 10L))
    assert(top(10)._1 == 41L)
  }

  test("NgramLm keeps fluent-under-the-model docs, drops unseen-transition docs") {
    // target (ids 1-4): only "a b" transitions; vocab {a,b}
    val docs = Seq(
      (1L, true, "a b a b a b"), (2L, true, "a b a b"),
      (3L, true, "a b"), (4L, true, "a b a b a b a b"),
      (5L, false, "a b a b"),   // fluent probe: all seen bigrams
      (6L, false, "b a b a"),   // "b a" seen (inside target runs)
      (7L, false, "z z z z"),   // unseen vocab: every transition 1/V
      (8L, false, "x")          // no transitions: kept by definition
    ).toDF("id", "tgt", "text")
    val out = NgramLm.perplexityFilter(docs, "id", "text", col("tgt"),
      thresholdMilliNat = -1500L)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // target counts: c(a)=9? no — tokens: doc1 a,b ×3; doc2 ×2; doc3 ×1;
    // doc4 ×4 → c(a)=10, c(b)=10, V=2; c(a,b)=10, c(b,a)=6
    // P(b|a)=(10+1)/(10+2)=11/12 → ln≈-0.087 ⇒ doc 5 mean ≈ -0.5 > -1.5
    assert(out(5L)._4, "fluent doc must pass")
    assert(out(6L)._4, "seen reverse transitions must pass")
    // doc 7: unseen context → ln(1/2)≈-0.693 per transition > -1.5: passes
    // at this loose threshold; tighten to see it fail
    val strict = NgramLm.perplexityFilter(docs, "id", "text", col("tgt"),
      thresholdMilliNat = -400L)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(strict(5L)._4 && !strict(7L)._4,
      "threshold must separate in-domain from unseen-vocab text")
    assert(out(8L)._4 && out(8L)._2 == 0L && out(8L)._3 == 0L,
      "transition-free doc is kept with zero stats")
    // hand-check doc 5: 3 transitions a→b,b→a,a→b
    val expected = 2 * fp(math.log(11.0 / 12.0)) + fp(math.log(7.0 / 12.0))
    assert(out(5L)._3 == expected)
  }

  test("NgramLm scores are exact under repartitioning") {
    val docs = (1 to 300).map { i =>
      (i.toLong, i % 3 == 0, (0 to i % 11).map(j => s"w${(i + j) % 13}")
        .mkString(" "))
    }.toDF("id", "tgt", "text")
    val a = NgramLm.perplexityFilter(docs, "id", "text", col("tgt"), -3000L)
      .collect().toSet
    val b = NgramLm.perplexityFilter(docs.repartition(17), "id", "text",
      col("tgt"), -3000L).collect().toSet
    assert(a == b && a.size == 300)
  }

  test("CMS estimates are one-sided and exact for collision-free vocabularies") {
    val docs = (1 to 100).map(i => s"w${i % 10} w${i % 10} w${i % 7}")
      .toDF("text")
    val out = Sketches.cmsTermCounts(docs, "text")
      .as[(String, Long, Long, Boolean)].collect()
    assert(out.length == 10) // w0..w9 (i%7 terms ⊂ i%10 terms)
    assert(out.forall(_._4), "CMS must never undercount")
    // 17 distinct terms over 4×256 cells: collisions are possible but the
    // min-over-rows estimate stays within the εN bound with huge margin
    val n = out.map(_._2).sum
    assert(out.forall(r => r._3 - r._2 <= n / 64))
    val again = Sketches.cmsTermCounts(docs.repartition(13), "text")
      .as[(String, Long, Long, Boolean)].collect().toSet
    assert(again == out.toSet, "sketch is deterministic, not RNG-seeded")
  }

  test("Dsir weights are exact under repartitioning") {
    val docs = (1 to 300).map { i =>
      (i.toLong, i % 4 == 0, (0 to i % 9).map(j => s"w${(i * j) % 17}")
        .mkString(" "))
    }.toDF("id", "tgt", "text")
    val a = Dsir.importanceWeights(docs, "id", "text", col("tgt"))
      .collect().toSet
    val b = Dsir.importanceWeights(docs.repartition(11), "id", "text",
      col("tgt")).collect().toSet
    assert(a == b)
  }
}
