package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** SemDeDup: ε-groups in embedding space, blocked by a coarse cluster
  * column. Load-bearing: transitivity (a chain of ε-pairs is ONE group),
  * min-id keeper, blocking actually restricts pairing, determinism. */
class SemDedupSpec extends SparkSuite {
  import spark.implicits._

  // block 0: ids 1,2,3 mutually ε-close; 4 a chain-neighbor of 3 only;
  //          9 orthogonal. block 1: 5,6 close; 7 orthogonal; 8 would pair
  //          with 1 if blocking were ignored (it must not).
  private def emb = Seq(
    (1L, 0, Array(1.0f, 0.01f, 0f, 0f)),
    (2L, 0, Array(1.0f, 0.02f, 0f, 0f)),
    (3L, 0, Array(1.0f, 0.03f, 0f, 0f)),
    (4L, 0, Array(0.6f, 0.8f, 0f, 0f)),   // cos(3,4) ≈ 0.62 < τ=0.9; not in
    (9L, 0, Array(0f, 0f, 1f, 0f)),
    (5L, 1, Array(0f, 1.0f, 0.01f, 0f)),
    (6L, 1, Array(0f, 1.0f, 0.02f, 0f)),
    (7L, 1, Array(0f, 0f, 0f, 1f)),
    (8L, 1, Array(1.0f, 0.015f, 0f, 0f))
  ).toDF("vec_id", "label", "embedding")

  test("clusters: transitive ε-groups within blocks, min-id component") {
    val cl = SemDedup.clusters(emb, "vec_id", "embedding", "label", 0.9)
      .as[(Long, Long)].collect().toMap
    assert(cl == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
    // 8 is ε-close to 1 in raw cosine but in another block — never paired
    assert(!cl.contains(8L) && !cl.contains(9L) && !cl.contains(4L))
  }

  test("prune keeps one representative per group plus all singletons") {
    val kept = SemDedup.prune(emb, "vec_id", "embedding", "label", 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L, 9L, 5L, 7L, 8L))
    // determinism under repartitioning
    val again = SemDedup.prune(emb.repartition(7), "vec_id", "embedding",
      "label", 0.9).select("vec_id").as[Long].collect().toSet
    assert(again == kept)
  }

  test("a chain of pairwise-close vectors collapses into one group") {
    // consecutive cos ≈ 0.995, ends cos ≈ 0.86 < τ — only transitivity
    // links them; per-pair dedup would keep the chain's far end
    val chain = (0 to 4).map { i =>
      val th = i * 0.1
      (i.toLong, 0, Array(math.cos(th).toFloat, math.sin(th).toFloat, 0f, 0f))
    }.toDF("vec_id", "label", "embedding")
    val kept = SemDedup.prune(chain, "vec_id", "embedding", "label", 0.99)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(0L))
  }
}
