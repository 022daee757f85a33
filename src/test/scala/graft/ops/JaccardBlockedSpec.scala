package graft.ops

import graft.SparkSuite

/** [[MinHashLsh.jaccardBlocked]] — the prefix-filtered candidate path must
  * be ROW-IDENTICAL to the naive all-pairs block join at any threshold
  * (prefix filtering is exact, not approximate). */
class JaccardBlockedSpec extends SparkSuite {
  import spark.implicits._

  // blocks with near-dups, disjoint docs, size-skewed docs, and an
  // empty-text doc; enough rows that the prefix filter actually prunes
  private def corpus = {
    val rnd = new scala.util.Random(11)
    val base = Seq.fill(40)(Seq.fill(30)(s"w${rnd.nextInt(200)}").mkString(" "))
    (base.zipWithIndex.map { case (t, i) =>
      (i.toLong, s"s${i % 3}", t)
    } ++ base.take(8).zipWithIndex.map { case (t, i) =>
      // planted near-dups: one word changed
      (100L + i, s"s${i % 3}", t.replaceFirst("w\\d+", "wCHANGED"))
    } :+ ((200L, "s0", "")) :+ ((201L, "s1", "tiny doc here")))
      .toDF("doc_id", "source", "text")
  }

  private def naive(threshold: Double) = {
    // threshold = 0 is the all-pairs face; filter afterwards = ground truth
    MinHashLsh.jaccardBlocked(corpus, "doc_id", "text", "source",
        shingleK = 3, threshold = 0.0)
      .where($"jaccard" >= threshold)
      .as[(Long, Long, Double)].collect().toSeq.sorted
  }

  test("prefix-filtered pairs equal the all-pairs ground truth") {
    for (t <- Seq(0.05, 0.12, 0.5, 0.9)) {
      val fast = MinHashLsh.jaccardBlocked(corpus, "doc_id", "text",
          "source", shingleK = 3, threshold = t)
        .as[(Long, Long, Double)].collect().toSeq.sorted
      assert(fast == naive(t), s"threshold $t diverged")
      assert(t > 0.5 || fast.nonEmpty, s"vacuous at $t")
    }
  }

  test("planted near-dups survive the candidate filter") {
    val got = MinHashLsh.jaccardBlocked(corpus, "doc_id", "text", "source",
        shingleK = 3, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    val plantedPairs = got.filter { case (a, b, _) => b >= 100L && b < 110L }
    assert(plantedPairs.size == 8,
      s"every planted near-dup pair found: $plantedPairs")
  }
}
