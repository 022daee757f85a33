package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[PageRank]] — integer fixed-point damped power iteration. */
class PageRankSpec extends SparkSuite {
  import spark.implicits._

  private val S = 1000000000000L

  test("one iteration on a two-node cycle is exact") {
    // a <-> b, n=2, init S/2 each; contribution = S/2 (outdeg 1);
    // new = 15S/200 + 85*(S/2)/100 for both
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = PageRank.ranks(e, "src", "dst", iters = 1)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    val expect = 15L * S / 200L + 85L * (S / 2L) / 100L
    assert(got == Seq((1L, expect), (2L, expect)))
  }

  test("dangling node redistributes its mass uniformly") {
    // a -> b, b dangling. n=2. init S/2.
    // iter1: in(b) = S/2; dang = rank(b) = S/2; dang/n = S/4
    //   a: base + 85*(0 + S/4)/100 ; b: base + 85*(S/2 + S/4)/100
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val got = PageRank.ranks(e, "src", "dst", iters = 1)
      .orderBy("node").as[(Long, Long)].collect().toMap
    val base = 15L * S / 200L
    assert(got(1L) == base + 85L * (S / 4L) / 100L)
    assert(got(2L) == base + 85L * (S / 2L + S / 4L) / 100L)
  }

  test("a hub gains rank over iterations; totals stay near scale") {
    // star: 1..4 all link to 5; 5 links back to 1
    val e = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L), (5L, 1L))
      .toDF("src", "dst")
    val r = PageRank.ranks(e, "src", "dst", iters = 8)
      .as[(Long, Long)].collect().toMap
    // the 1<->5 pair trades mass each round (period-2 oscillation decays
    // at 0.85² per cycle), so compare the pair against the leaves rather
    // than each other at a fixed iteration count
    assert(r(5L) > r(2L) && r(1L) > r(2L),
      "the hub cycle holds more rank than any leaf")
    assert(r(2L) == r(3L) && r(3L) == r(4L), "symmetric leaves tie")
    val total = r.values.sum
    // floor losses only shrink the total, never grow it
    assert(total <= S && total > S * 95L / 100L, s"total $total")
  }

  test("iterations are deterministic across partitionings") {
    val edges = (0L until 120L).map(d => (d % 10, (d * 7 + 3) % 12))
    val one = PageRank.ranks(edges.toDF("src", "dst").repartition(1),
      "src", "dst", 5).orderBy("node").as[(Long, Long)].collect().toSeq
    val many = PageRank.ranks(edges.toDF("src", "dst").repartition(7),
      "src", "dst", 5).orderBy("node").as[(Long, Long)].collect().toSeq
    assert(one == many, "integer sums are partition-order-independent")
  }

  test("topRanks ordering is (rank desc, node asc)") {
    val e = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val top = PageRank.topRanks(e, "src", "dst", 3, 2)
      .as[(Long, Long)].collect().toSeq
    assert(top.size == 2 && top.head._2 >= top(1)._2)
    assert(top.map(_._1).distinct.size == 2)
  }
}
