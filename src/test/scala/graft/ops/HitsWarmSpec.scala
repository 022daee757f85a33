package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[Hits.scoresWarm]] — the crawl-delta warm start on the
  * mutual-reinforcement side. Same contraction argument as
  * [[PageRankWarmSpec]] (power iteration on AᵀA), but NO seed
  * renormalization: every half-round L1-normalizes, so only seed ratios
  * matter and the PageRank mass-surplus failure mode cannot occur. */
class HitsWarmSpec extends SparkSuite {
  import spark.implicits._

  private val S = 1000000L

  private def skewed(docs: Seq[Long]): DataFrame =
    docs.map(d => (d % 50, d % 7))
      .++(docs.map(d => (d % 50, (d * 17 + 1) % 50)))
      .toDF("src", "dst")

  private def collect3(df: DataFrame): Map[Long, (Long, Long)] =
    df.as[(Long, Long, Long)].collect()
      .map { case (n, h, a) => n -> (h, a) }.toMap

  test("warm start from a cold prefix equals the continued cold run") {
    val e = skewed(0L until 120L)
    val cold6 = Hits.scores(e, "src", "dst", iters = 6)
    val warm = Hits.scoresWarm(e, "src", "dst", iters = 2,
      init = Hits.scores(e, "src", "dst", iters = 4)
        .select(col("node"), col("hub")))
    assert(collect3(warm) == collect3(cold6),
      "4 cold + 2 warm round pairs must equal 6 cold, hub AND auth")
  }

  test("warm start reaches movement tolerance in fewer rounds than cold") {
    val e = skewed(0L until 120L)
    val e0 = skewed((0L until 120L).filter(_ % 10 != 9))
    def hubOf(df: DataFrame): Seq[(Long, Long)] =
      df.select(col("node"), col("hub")).orderBy("node")
        .as[(Long, Long)].collect().toSeq
    def roundsToTol(init: Seq[(Long, Long)], tol: Long,
                    cap: Int = 40): Int = {
      var h = init
      var steps = 0
      var moving = true
      while (moving && steps < cap) {
        val next = hubOf(Hits.scoresWarm(e, "src", "dst", iters = 1,
          init = h.toDF("node", "hub")))
        val prev = h.toMap
        val move = next.map { case (nd, v) =>
          math.abs(v - prev.getOrElse(nd, 0L)) }.max
        moving = move >= tol
        h = next
        steps += 1
      }
      assert(steps < cap, "did not converge within the cap")
      steps
    }
    val tol = S / 10000L // 10^-4 of total hub mass, per node
    // the cold seed: every graph node at uniform full scale (exactly
    // the scores() init — ratios are all that matter)
    val coldSeed = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().as[Long].collect().toSeq.sorted.map(_ -> S)
    val coldSteps = roundsToTol(coldSeed, tol)
    val warmSteps = roundsToTol(
      hubOf(Hits.scores(e0, "src", "dst", iters = 6)), tol)
    assert(warmSteps < coldSteps,
      s"warm $warmSteps rounds must beat cold $coldSteps")
  }
}
