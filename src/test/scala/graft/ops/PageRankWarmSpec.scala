package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[PageRank.ranksWarm]] — the crawl-delta warm start. The damped
  * iteration is a contraction toward one fixed point, so (a) warm-starting
  * from a PREFIX of the cold run must equal continuing the cold run —
  * exact, integer-for-integer — and (b) a start vector near the fixed
  * point must need measurably fewer rounds to stop moving than uniform
  * mass: the quantitative claim behind appending edge deltas instead of
  * re-ranking cold ([[EdgeIndex]], `q_pagerank_incremental`). The
  * renormalization of a delta-inflated seed back to fixed-point total is
  * load-bearing for (b): surplus mass decays at only 0.85/round, and an
  * unnormalized warm start measured 25 rounds vs cold's 11. */
class PageRankWarmSpec extends SparkSuite {
  import spark.implicits._

  /** Rescale-compatible scale: rank·S must stay inside 2^63. */
  private val S = 1000000000L

  /** Planted residue graph over `docs` document ids (the WebQueries
    * shape: sites 50–59 only ever targets, so dangling mass flows). */
  private def planted(docs: Seq[Long]): DataFrame =
    docs.map(d => (d % 50, (d * 7 + 3) % 60))
      .++(docs.map(d => (d % 50, (d * 13 + 11) % 60)))
      .toDF("src", "dst")

  private def collectRanks(df: DataFrame): Map[Long, Long] =
    df.as[(Long, Long)].collect().toMap

  test("warm start from a cold prefix equals the continued cold run") {
    // same node set, prefix total ≤ scale — no renormalization fires,
    // so 3 cold + 2 warm rounds must equal 5 cold rounds exactly
    val e = planted(0L until 120L)
    val cold5 = PageRank.ranks(e, "src", "dst", iters = 5)
    val warm = PageRank.ranksWarm(e, "src", "dst", iters = 2,
      init = PageRank.ranks(e, "src", "dst", iters = 3))
    assert(collectRanks(warm) == collectRanks(cold5))
  }

  /** Delta edges introducing BRAND-NEW node ids (the planted residue
    * graph's node set is closed — every delta doc's src/dst residue
    * already appears — so new-node coverage needs explicit edges). */
  private def newNodeDelta: DataFrame =
    Seq((1000L, 3L), (4L, 1001L), (1000L, 1001L)).toDF("src", "dst")

  test("iters=0 seed: init for old nodes, uniform for delta, renormed") {
    val e0 = planted(0L until 120L)
    val e = e0.unionAll(newNodeDelta)
    val prev = PageRank.ranks(e0, "src", "dst", iters = 4, scale = S)
    val prevMap = collectRanks(prev)
    val start = collectRanks(
      PageRank.ranksWarm(e, "src", "dst", iters = 0, init = prev,
        scale = S))
    val n = start.size
    val raw = start.keys.map(nd =>
      nd -> prevMap.getOrElse(nd, S / n)).toMap
    val total = raw.values.sum
    assert(total > S, "the delta fixture must actually inflate the mass")
    start.foreach { case (node, rank) =>
      assert(rank == raw(node) * S / total,
        s"node $node: got $rank, raw=${raw(node)}, total=$total")
    }
    assert(prevMap.keySet.subsetOf(start.keySet))
  }

  test("warm start reaches movement tolerance in fewer rounds than cold") {
    // a SKEWED graph (hub targets 0..6 soak up in-links): its fixed
    // point sits far from uniform, so the uniform cold start is a bad
    // seed and the previous snapshot's ranks a good one. (On the
    // near-regular planted residue graph the fixed point ≈ uniform and
    // cold wins by construction — measured 11 vs 20 — which says the
    // fixture was degenerate, not that warm starts don't help.)
    def skewed(docs: Seq[Long]): DataFrame =
      docs.map(d => (d % 50, d % 7))
        .++(docs.map(d => (d % 50, (d * 17 + 1) % 50)))
        .toDF("src", "dst")
    val e = skewed(0L until 120L)
    val e0 = skewed((0L until 120L).filter(_ % 10 != 9))
    // rounds until the max per-node movement drops under tol (integer
    // fixed point — fully deterministic)
    def roundsToTol(init: DataFrame, tol: Long, cap: Int = 40): Int = {
      var r = init.orderBy("node").as[(Long, Long)].collect().toSeq
      var steps = 0
      var moving = true
      while (moving && steps < cap) {
        val next = PageRank.ranksWarm(e, "src", "dst", iters = 1,
            init = r.toDF("node", "rank"), scale = S)
          .orderBy("node").as[(Long, Long)].collect().toSeq
        val prev = r.toMap
        val move = next.map { case (nd, rk) =>
          math.abs(rk - prev.getOrElse(nd, 0L)) }.max
        moving = move >= tol
        r = next
        steps += 1
      }
      assert(steps < cap, "did not converge within the cap")
      steps
    }
    val tol = S / 100000L // 10^-5 of total mass, per node
    val coldSteps = roundsToTol(
      PageRank.ranks(e, "src", "dst", iters = 0, scale = S), tol)
    val warmSteps = roundsToTol(
      PageRank.ranksWarm(e, "src", "dst", iters = 0, scale = S,
        init = PageRank.ranks(e0, "src", "dst", iters = 8, scale = S)),
      tol)
    assert(warmSteps < coldSteps,
      s"warm $warmSteps rounds must beat cold $coldSteps")
  }

  test("delta-inflated seed at a rescale-unsafe scale fails loudly") {
    // rank·scale would overflow 2^63 at the default 1e12 scale, so the
    // renormalizing path must refuse rather than wrap
    val e0 = planted(0L until 120L)
    val e = e0.unionAll(newNodeDelta)
    val prev = PageRank.ranks(e0, "src", "dst", iters = 1)
    intercept[IllegalArgumentException] {
      PageRank.ranksWarm(e, "src", "dst", iters = 1, init = prev)
    }
  }
}
