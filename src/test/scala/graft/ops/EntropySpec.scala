package graft.ops

import graft.SparkSuite

/** [[Entropy]] — n-scaled fixed-point word entropy. */
class EntropySpec extends SparkSuite {
  import spark.implicits._

  test("hand-computed exact values on tiny documents") {
    val docs = Seq(
      (1L, "a a b"),          // H·n = 3·lnfp(3) − 2·lnfp(2) − 1·lnfp(1)
      (2L, "x x x x"),        // uniform single word → entropy 0
      (3L, "p q r s"),        // all distinct → H·n = n·lnfp(n)
      (4L, "solo"))           // single token → 0
      .toDF("doc_id", "text")
    val got = Entropy.wordEntropy(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    def lnfp(x: Long) = math.floor(math.log(x.toDouble) * 1e6 + 0.5).toLong
    assert(got == Seq(
      (1L, 3L, 2L, 3L * lnfp(3) - 2L * lnfp(2)),
      (2L, 4L, 1L, 4L * lnfp(4) - 4L * lnfp(4)),
      (3L, 4L, 4L, 4L * lnfp(4)),
      (4L, 1L, 1L, 0L)))
    assert(got(1)._4 == 0L, "uniform repetition has zero entropy")
  }

  test("repetitive spam scores below varied prose of the same length") {
    val docs = Seq(
      (1L, "buy now buy now buy now buy now buy now buy now"),
      (2L, "twelve different words appear in this sentence making it varied prose here"))
      .toDF("doc_id", "text")
    val m = Entropy.wordEntropy(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._4.toDouble / r._2)).toMap // mean micro-nats
    assert(m(1L) < m(2L), s"spam ${m(1L)} should be below prose ${m(2L)}")
  }

  test("partition-order independent (integer sums)") {
    val docs = (1L to 120L).map(i => (i, s"w${i % 7} w${i % 3} w${i % 7} tail"))
    val one = Entropy.wordEntropy(docs.toDF("doc_id", "text").repartition(1),
      "doc_id", "text").orderBy("doc_id").collect().toSeq
    val many = Entropy.wordEntropy(docs.toDF("doc_id", "text").repartition(7),
      "doc_id", "text").orderBy("doc_id").collect().toSeq
    assert(one == many)
  }
}
