package graft.props

import graft.SparkSuite
import graft.ops.{Bloom, Sampling, Shards}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generated-input properties for the curation primitives: the bloom
  * filter's zero-false-negative law, the epoch shuffle's permutation law,
  * and the temperature sampler's quota accounting — each checked across
  * randomized corpora, not one fixture. */
class CurationProperties extends SparkSuite {
  import spark.implicits._

  private val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta")
  private val docGen: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, wordGen))
      .map(_.mkString(" "))

  private def corpus(seed: Long, n: Int) =
    (0 until n).map { i =>
      (i.toLong, docGen(Gen.Parameters.default, Seed(seed + i)).get)
    }.toDF("id", "text")

  test("bloom never misses: every present key is a hit, on every generated split") {
    (0 until 6).foreach { i =>
      val docs = corpus(100L * i, 120)
      val idx = docs.where($"id" % 3 =!= i % 3)
      val out = Bloom.prefilterDedup(docs, idx, "id", "text")
      assert(out.where(!$"admissible").count() == 0, s"round $i broke the law")
      assert(out.where($"present" && !$"bloom_hit").count() == 0)
    }
  }

  test("epoch shuffle is a permutation for arbitrary shard counts and seeds") {
    val docs = corpus(7L, 150)
    for (n <- Seq(1, 3, 8, 64); seed <- Seq(0L, 9L)) {
      val deal = Shards.epochShuffle(docs, "id", seed, n).cache()
      assert(deal.count() == 150 &&
        deal.select("id").distinct().count() == 150)
      val bad = deal.groupBy("shard")
        .agg(count(lit(1)).as("cnt"), min("pos").as("mn"), max("pos").as("mx"),
          count_distinct($"pos").as("d"))
        .where($"mn" =!= 0 || $"mx" =!= $"cnt" - 1 || $"d" =!= $"cnt")
      assert(bad.count() == 0, s"n=$n seed=$seed positions not dense")
      assert(deal.where($"shard" < 0 || $"shard" >= n).count() == 0)
      deal.unpersist()
    }
  }

  test("salted stratified top-k equals the one-shot selection on skewed strata") {
    // one dominant stratum (the 100 TB shape the salt exists for) + tiny ones
    val docs = ((1 to 3000).map(i => (i.toLong, "big")) ++
      (1 to 40).map(i => (10000L + i, "small")) ++
      Seq((20001L, "solo")))
      .toDF("id", "lang")
    for (k <- Seq(1, 25, 100); salts <- Seq(2, 8, 32)) {
      val plain = Sampling.stratifiedTopK(docs, Seq("lang"), $"id", k)
        .select("id").as[Long].collect().toSet
      val salted = Sampling.stratifiedTopKSalted(docs, Seq("lang"), $"id",
        k, salts).select("id").as[Long].collect().toSet
      assert(salted == plain, s"k=$k salts=$salts diverged")
    }
  }

  test("temperature quotas: sum ≤ budget, never exceed a domain's size, monotone") {
    val docs = ((1 to 900).map(i => (i.toLong, "big", 2L)) ++
      (1 to 64).map(i => (2000L + i, "mid", 2L)) ++
      (1 to 4).map(i => (3000L + i, "tiny", 2L)))
      .toDF("id", "domain", "w")
    for (budget <- Seq(10L, 50L, 200L)) {
      val out = Sampling.temperatureTopK(docs, "domain", $"id", $"w", budget)
        .cache()
      val picked = out.groupBy("domain").count()
        .as[(String, Long)].collect().toMap
      assert(picked.values.sum <= budget)
      // a domain never yields more than it has; floor-division quotas never
      // overshoot the α-share
      assert(picked.getOrElse("tiny", 0L) <= 4L)
      out.unpersist()
    }
    // α = 1/2 up-samples the small domain vs its proportional share:
    // tiny is 4/968 ≈ 0.4% of docs but sqrt-share ≈ 4.5%
    val at200 = Sampling.temperatureTopK(docs, "domain", $"id", $"w", 200L)
      .groupBy("domain").count().as[(String, Long)].collect().toMap
    assert(at200.getOrElse("tiny", 0L) >= 4L * 200L / 968L + 1L)
  }
}
