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
    // cutoff 0 forces every block through the prefix path; cutoff 16
    // splits the corpus (blocks of ~15–18 docs) across BOTH paths; the
    // default sends this small corpus wholly down the all-pairs fast path
    for (t <- Seq(0.05, 0.12, 0.5, 0.9); cutoff <- Seq(0, 16, 512)) {
      val fast = MinHashLsh.jaccardBlocked(corpus, "doc_id", "text",
          "source", shingleK = 3, threshold = t, smallBlockCutoff = cutoff)
        .as[(Long, Long, Double)].collect().toSeq.sorted
      assert(fast == naive(t), s"threshold $t cutoff $cutoff diverged")
      assert(t > 0.5 || fast.nonEmpty, s"vacuous at $t")
    }
  }

  test("exact threshold boundary: J = t exactly, |A| = t·|B| exactly") {
    // the double-arithmetic bug class: at t = 0.1 (non-dyadic), n = 30,
    // ceil(0.1·30) in doubles inflates to 4 (prefix below the Bayardo
    // bound) and the size-ratio test |A| ≥ 0.1·|B| is FALSE in doubles at
    // exact equality (3.0 >= 0.1*30 → false) — pair (3,4) below sits on
    // BOTH boundaries: A ⊂ B, |A| = 3, |B| = 30, J = 3/30 = 0.1 exactly
    def doc(tag: String, shared: Int) =
      ((0 until shared).map(i => s"sh$i") ++
        (shared until 30).map(i => s"$tag$i")).mkString(" ")
    // shingleK = 1 ⇒ shingle set = word set (sizes exact by construction)
    val docs = Seq(
      (1L, "b", doc("a", 20)), (2L, "b", doc("b", 20)), // J = 20/40 = 0.5
      (3L, "b", "sh0 sh1 sh2"),                         // A ⊂ B, |A| = 3
      (4L, "b", doc("e", 3))                            // J(3,4) = 3/30 = 0.1
    ).toDF("doc_id", "source", "text")
    for (t <- Seq(0.1, 0.5); cutoff <- Seq(0, 512)) {
      val fast = MinHashLsh.jaccardBlocked(docs, "doc_id", "text", "source",
          shingleK = 1, threshold = t, smallBlockCutoff = cutoff)
        .as[(Long, Long, Double)].collect().toSeq.sorted
      val truth = MinHashLsh.jaccardBlocked(docs, "doc_id", "text", "source",
          shingleK = 1, threshold = 0.0)
        .where($"jaccard" >= t)
        .as[(Long, Long, Double)].collect().toSeq.sorted
      assert(fast == truth, s"t=$t cutoff=$cutoff: $fast vs $truth")
      if (t == 0.1) assert(fast.contains((3L, 4L, 0.1)),
        s"the J-exactly-at-threshold pair must survive: $fast")
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
