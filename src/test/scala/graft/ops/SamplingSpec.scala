package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Deterministic curation sampling: hash-Bernoulli, stratified reservoir,
  * weight budget. The load-bearing properties are determinism under
  * repartitioning (replayed batches must re-select identical rows) and
  * per-stratum bounds. */
class SamplingSpec extends SparkSuite {
  import spark.implicits._

  private def corpus = (1 to 2000).map { i =>
    (i.toLong, s"lang${i % 3}", 100L + i % 57)
  }.toDF("id", "lang", "weight")

  test("fracThreshold maps fractions to the md5 hex domain") {
    assert(Sampling.fracThreshold(0.0) == "0" * 32)
    assert(Sampling.fracThreshold(0.25) == "4" + "0" * 31)
    assert(Sampling.fracThreshold(0.5) == "8" + "0" * 31)
    assert(Sampling.fracThreshold(1.0) == "g") // above every hex digit
    intercept[IllegalArgumentException](Sampling.fracThreshold(1.5))
  }

  test("hashFraction is deterministic, partition-independent, and unbiased-ish") {
    val df = corpus
    val a = Sampling.hashFraction(df, col("id"), 0.25)
      .select("id").as[Long].collect().toSet
    val b = Sampling.hashFraction(df.repartition(13), col("id"), 0.25)
      .select("id").as[Long].collect().toSet
    assert(a == b) // replay on different partitioning selects the same rows
    assert(math.abs(a.size - 500) < 120) // ~25% of 2000, md5-uniform
    // monotone in frac: a smaller fraction selects a subset
    val tenth = Sampling.hashFraction(df, col("id"), 0.1)
      .select("id").as[Long].collect().toSet
    assert(tenth.subsetOf(a))
    assert(Sampling.hashFraction(df, col("id"), 1.0).count() == 2000)
    assert(Sampling.hashFraction(df, col("id"), 0.0).count() == 0)
  }

  test("stratifiedTopK caps every stratum and is deterministic") {
    val out = Sampling.stratifiedTopK(corpus, Seq("lang"), col("id"), 40)
    val sizes = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(sizes.values.forall(_ == 40) && sizes.size == 3)
    val again = Sampling.stratifiedTopK(corpus.repartition(7), Seq("lang"),
      col("id"), 40).select("id").as[Long].collect().toSet
    assert(again == out.select("id").as[Long].collect().toSet)
    // a stratum smaller than k is kept whole
    val tiny = Seq((1L, "only", 5L), (2L, "only", 6L))
      .toDF("id", "lang", "weight")
    assert(Sampling.stratifiedTopK(tiny, Seq("lang"), col("id"), 40)
      .count() == 2)
  }

  test("weightBudget fills each stratum to the budget, first row always in") {
    val out = Sampling.weightBudget(corpus, Seq("lang"), col("id"),
      col("weight"), 1000L)
    val byLang = out.groupBy("lang")
      .agg(sum("weight").as[Long], count(lit(1)))
      .as[(String, Long, Long)].collect()
    byLang.foreach { case (lang, total, n) =>
      // admitted set sums to < budget + one overshooting row's weight
      assert(total - 1000L < 157L, s"$lang total $total")
      assert(n >= 1)
    }
    // a single row heavier than the budget is still admitted
    val heavy = Seq((1L, "x", 5000L)).toDF("id", "lang", "weight")
    assert(Sampling.weightBudget(heavy, Seq("x").map(_ => "lang"), col("id"),
      col("weight"), 100L).count() == 1)
    // determinism under repartitioning
    val again = Sampling.weightBudget(corpus.repartition(9), Seq("lang"),
      col("id"), col("weight"), 1000L).select("id").as[Long].collect().toSet
    assert(again == out.select("id").as[Long].collect().toSet)
  }

  test("weightedTopK selects proportionally to weight, deterministically") {
    // two weight classes: ids 1-200 weight 1, ids 201-400 weight 20 —
    // A-ES must overrepresent the heavy class in a k=100 sample
    val df = ((1 to 200).map(i => (i.toLong, "s", 1L)) ++
      (201 to 400).map(i => (i.toLong, "s", 20L))).toDF("id", "lang", "w")
    val out = Sampling.weightedTopK(df, Seq("lang"), col("id"), col("w"), 100)
      .select("id").as[Long].collect().toSet
    assert(out.size == 100)
    val heavy = out.count(_ > 200)
    assert(heavy > 75, s"weight-20 rows must dominate, got $heavy/100")
    // determinism under repartitioning — no RNG anywhere
    val again = Sampling.weightedTopK(df.repartition(9), Seq("lang"),
      col("id"), col("w"), 100).select("id").as[Long].collect().toSet
    assert(again == out)
    // per-stratum cap holds and small strata are kept whole
    val multi = ((1 to 50).map(i => (i.toLong, s"l${i % 2}", 5L)) ++
      Seq((99L, "tiny", 1L))).toDF("id", "lang", "w")
    val sizes = Sampling.weightedTopK(multi, Seq("lang"), col("id"),
      col("w"), 10).groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    assert(sizes("l0") == 10 && sizes("l1") == 10 && sizes("tiny") == 1)
  }

  test("mixtureBudget fills each stratum to ITS budget; unlisted strata drop") {
    val budgets = Map("lang0" -> 2000L, "lang1" -> 500L) // lang2 unlisted
    val out = Sampling.mixtureBudget(corpus, "lang", col("id"),
      col("weight"), budgets)
    val byLang = out.groupBy("lang")
      .agg(sum("weight").as[Long], count(lit(1)))
      .as[(String, Long, Long)].collect()
      .map { case (l, t, n) => l -> (t, n) }.toMap
    assert(!byLang.contains("lang2"), "unlisted stratum must contribute 0")
    assert(byLang("lang0")._1 - 1000L > byLang("lang1")._1,
      "the 4x budget admits visibly more weight")
    // fill-until-full: total < budget + one overshooting row (max w = 156)
    assert(byLang("lang0")._1 - 2000L < 157L)
    assert(byLang("lang1")._1 - 500L < 157L)
    // per-stratum selection equals the single-budget op at that budget —
    // mixing is exactly "weightBudget with a per-domain quota"
    val lang1Only = Sampling.weightBudget(corpus.where(col("lang") === "lang1"),
      Seq("lang"), col("id"), col("weight"), 500L)
      .select("id").as[Long].collect().toSet
    assert(out.where(col("lang") === "lang1")
      .select("id").as[Long].collect().toSet == lang1Only)
    // determinism under repartitioning
    val again = Sampling.mixtureBudget(corpus.repartition(9), "lang",
      col("id"), col("weight"), budgets)
      .select("id").as[Long].collect().toSet
    assert(again == out.select("id").as[Long].collect().toSet)
  }

  test("epochMixture repeats fractionally, drops at 0, defaults to 1") {
    val out = Sampling.epochMixture(corpus, col("id"), "lang",
      Map("lang0" -> 2.0, "lang1" -> 1.5, "lang2" -> 0.0))
      .select("id", "lang", "epoch").as[(Long, String, Long)].collect()
    val byLang = out.groupBy(_._2)
    // lang0 ×2.0: EVERY doc exactly twice (epochs 0 and 1)
    val l0 = byLang("lang0")
    assert(l0.groupBy(_._1).forall { case (_, rs) =>
      rs.map(_._3).sorted.toSeq == Seq(0L, 1L) })
    // lang1 ×1.5: every doc once, roughly half twice — and the extra copy
    // is always epoch 1 on top of epoch 0
    val l1 = byLang("lang1").groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq)
    assert(l1.values.forall(e => e == Seq(0L) || e == Seq(0L, 1L)))
    val twice = l1.values.count(_ == Seq(0L, 1L)).toDouble / l1.size
    assert(twice > 0.38 && twice < 0.62, s"fractional share $twice")
    // lang2 ×0.0: dropped entirely
    assert(!byLang.contains("lang2"))

    // unlisted stratum passes through at exactly one epoch
    val dflt = Sampling.epochMixture(corpus, col("id"), "lang",
      Map("lang0" -> 3.0))
    assert(dflt.where(col("lang") =!= "lang0").groupBy("id").count()
      .where(col("count") =!= 1).count() == 0)

    // determinism under repartitioning (replay-stability)
    val again = Sampling.epochMixture(corpus.repartition(11), col("id"),
      "lang", Map("lang0" -> 2.0, "lang1" -> 1.5, "lang2" -> 0.0))
      .select("id", "epoch").as[(Long, Long)].collect().toSet
    assert(again == out.map(r => (r._1, r._3)).toSet)
  }
}
