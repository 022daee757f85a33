package graft.ops

import graft.SparkSuite

/** [[MinHashLsh.containmentBlocked]] — the asymmetric prefix-filtered
  * candidate path must be ROW-IDENTICAL to the naive all-ordered-pairs
  * block join at any threshold (the filter is exact, not approximate),
  * and must catch the embedded-document case Jaccard structurally
  * misses. */
class ContainmentBlockedSpec extends SparkSuite {
  import spark.implicits._

  // blocks with near-dups, disjoint docs, size-skewed docs, an empty
  // doc — and a SHORT doc embedded whole inside a much longer one
  private def corpus = {
    val rnd = new scala.util.Random(13)
    val base = Seq.fill(40)(Seq.fill(30)(s"w${rnd.nextInt(200)}").mkString(" "))
    val host = base.head // 30 words
    val quote = host.split(" ").slice(5, 13).mkString(" ") // 8 words inside
    (base.zipWithIndex.map { case (t, i) =>
      (i.toLong, s"s${i % 3}", t)
    } ++ base.take(8).zipWithIndex.map { case (t, i) =>
      (100L + i, s"s${i % 3}", t.replaceFirst("w\\d+", "wCHANGED"))
    } :+ ((200L, "s0", ""))
      :+ ((201L, "s0", quote))) // embedded in doc 0 (block s0)
      .toDF("doc_id", "source", "text")
  }

  private def naive(threshold: Double) =
    MinHashLsh.containmentBlocked(corpus, "doc_id", "text", "source",
        shingleK = 3, threshold = 0.0)
      .where($"containment" >= threshold)
      .as[(Long, Long, Double)].collect().toSeq.sorted

  test("prefix-filtered pairs equal the all-ordered-pairs ground truth") {
    // cutoff 0 forces every block through the prefix path; cutoff 16
    // splits blocks across BOTH paths; the default sends this corpus
    // wholly down the all-pairs fast path
    for (t <- Seq(0.05, 0.3, 0.5, 0.9); cutoff <- Seq(0, 16, 512)) {
      val fast = MinHashLsh.containmentBlocked(corpus, "doc_id", "text",
          "source", shingleK = 3, threshold = t, smallBlockCutoff = cutoff)
        .as[(Long, Long, Double)].collect().toSeq.sorted
      assert(fast == naive(t), s"threshold $t cutoff $cutoff diverged")
      assert(fast.nonEmpty, s"vacuous at $t")
    }
  }

  test("an embedded document is caught at containment 1.0 where its " +
    "Jaccard is diluted below any useful threshold") {
    val c = MinHashLsh.containmentBlocked(corpus, "doc_id", "text",
        "source", shingleK = 3, threshold = 0.9, smallBlockCutoff = 0)
      .as[(Long, Long, Double)].collect().toMap2
    assert(c.get((201L, 0L)).contains(1.0),
      s"quote doc must be fully contained in its host: $c")
    // direction matters: the host is NOT contained in the quote
    assert(!c.contains((0L, 201L)))
    // and Jaccard on the same pair is tiny (6 shared trigrams / 28+6-6)
    val j = MinHashLsh.jaccardBlocked(corpus, "doc_id", "text", "source",
        shingleK = 3, threshold = 0.0)
      .where($"doc_a" === 0L && $"doc_b" === 201L)
      .select($"jaccard").as[Double].collect()
    assert(j.length == 1 && j.head < 0.3,
      s"jaccard should be diluted by the host's size: ${j.toSeq}")
  }

  test("empty shingle sets contain nothing and self-pairs are dropped") {
    val all = MinHashLsh.containmentBlocked(corpus, "doc_id", "text",
        "source", shingleK = 3, threshold = 0.0)
      .as[(Long, Long, Double)].collect()
    assert(!all.exists(_._1 == 200L), "empty doc must contain nothing")
    assert(!all.exists(p => p._1 == p._2), "self-pairs must be dropped")
    // containment is bounded and directional: C(a->b) uses |a| only
    assert(all.forall(p => p._3 >= 0.0 && p._3 <= 1.0))
  }

  private implicit class ToMap2(
      rows: Array[(Long, Long, Double)]) {
    def toMap2: Map[(Long, Long), Double] =
      rows.map(r => (r._1, r._2) -> r._3).toMap
  }
}
