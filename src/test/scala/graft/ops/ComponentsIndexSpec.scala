package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ComponentsIndexSpec extends SparkSuite {
  import spark.implicits._

  private def tmp() = java.nio.file.Files
    .createTempDirectory("graft-cc-idx").toFile.getAbsolutePath

  private def resolve(idx: ComponentsIndex): Map[Long, Long] =
    idx.resolveAll().as[(Long, Long)].collect().toMap

  test("batched appends resolve to the one-shot closure") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (3L, 10L),
      (20L, 21L))
    val oneShot = Components.connected(
      pairs.toDF("doc_a", "doc_b"), "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap

    val idx = new ComponentsIndex(spark, tmp())
    pairs.grouped(2).zipWithIndex.foreach { case (b, i) =>
      idx.addPairs(b.toDF("doc_a", "doc_b"), ord = i.toLong)
    }
    assert(resolve(idx) == oneShot)
  }

  test("a later batch merges two existing clusters") {
    val idx = new ComponentsIndex(spark, tmp())
    idx.addPairs(Seq((1L, 2L), (10L, 11L)).toDF("doc_a", "doc_b"), ord = 1)
    assert(resolve(idx) == Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L))
    idx.addPairs(Seq((2L, 11L)).toDF("doc_a", "doc_b"), ord = 2)
    assert(resolve(idx).values.toSet == Set(1L))
  }

  test("replayed batches are idempotent") {
    val idx = new ComponentsIndex(spark, tmp())
    val b = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    idx.addPairs(b, ord = 1)
    val before = resolve(idx)
    idx.addPairs(b, ord = 1) // crash-replay: same batch again
    assert(resolve(idx) == before)
  }

  test("compact flattens state to O(nodes) stars without changing resolution") {
    val path = tmp()
    val idx = new ComponentsIndex(spark, path)
    // a chain built one link per batch: links pile up across generations
    (0L until 10L).foreach(i =>
      idx.addPairs(Seq((i, i + 1)).toDF("doc_a", "doc_b"), ord = i))
    val before = resolve(idx)
    idx.compact()
    assert(resolve(idx) == before)
    // post-compact state is one row per node: member stars + root self-rows
    val live = java.nio.file.Files.readString(
      java.nio.file.Paths.get(path, "_current")).trim
    val stars = spark.read.parquet(new java.io.File(
      new java.io.File(path, live), "stars").getAbsolutePath)
    assert(stars.count() == before.size)
    // appends keep working after a compact
    idx.addPairs(Seq((100L, 0L)).toDF("doc_a", "doc_b"), ord = 99)
    assert(resolve(idx)(100L) == 0L)
  }

  test("retention dissolves clusters held only by expired links") {
    val idx = new ComponentsIndex(spark, tmp())
    idx.addPairs(Seq((1L, 2L)).toDF("doc_a", "doc_b"), ord = 1)
    idx.addPairs(Seq((2L, 3L)).toDF("doc_a", "doc_b"), ord = 5)
    idx.compact(retainOrdGe = Some(3L))
    // node 1's newest evidence (ord 1) predates the horizon: 1 drops out
    // entirely, 2~3 survive on their own fresh link
    assert(resolve(idx) == Map(2L -> 2L, 3L -> 2L))
  }

  test("a maintenance compact cannot launder expired evidence") {
    val idx = new ComponentsIndex(spark, tmp())
    idx.addPairs(Seq((1L, 2L)).toDF("doc_a", "doc_b"), ord = 1)
    idx.addPairs(Seq((2L, 3L)).toDF("doc_a", "doc_b"), ord = 5)
    // a plain compact between the appends and the retention pass must not
    // refresh node 1's age to its cluster's newest ord: the same horizon
    // still expires it (compaction contracts links through the root, so
    // retention after it may dissolve MORE than link-level retention — the
    // conservative direction — but never keeps a stale node alive)
    idx.compact()
    idx.compact(retainOrdGe = Some(3L))
    assert(!resolve(idx).contains(1L))
  }

  test("a fresh link keeps only its own endpoints alive across retention") {
    val idx = new ComponentsIndex(spark, tmp())
    idx.addPairs(Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b"), ord = 1)
    idx.addPairs(Seq((2L, 3L)).toDF("doc_a", "doc_b"), ord = 9)
    idx.compact(retainOrdGe = Some(5L))
    // 2 and 3 were re-affirmed at ord 9; 1 was not and expires even though
    // its cluster has fresh evidence elsewhere
    assert(resolve(idx) == Map(2L -> 2L, 3L -> 2L))
  }

  test("post-compact resolution closes only the contracted delta") {
    val idx = new ComponentsIndex(spark, tmp())
    // a 41-node chain needs several alternating-star rounds to close —
    // a 2-round budget must blow up while the history IS the closure input
    val chain = (0L until 40L).map(i => (i, i + 1))
    idx.addPairs(chain.toDF("doc_a", "doc_b"), ord = 1)
    intercept[IllegalArgumentException](idx.resolveAll(maxRounds = 2))
    idx.compact()
    // one link appended after the compact: the closure input is now the
    // single contracted (root, fresh-node) edge, which converges inside
    // the same 2-round budget the full history overran — the rounds bound
    // tracks the delta, not the accumulated links
    idx.addPairs(Seq((41L, 40L)).toDF("doc_a", "doc_b"), ord = 2)
    val r = idx.resolveAll(maxRounds = 2).as[(Long, Long)].collect().toMap
    assert(r == (0L to 41L).map(_ -> 0L).toMap)
  }

  test("an empty index resolves to an empty mapping") {
    val idx = new ComponentsIndex(spark, tmp())
    assert(idx.resolveAll().isEmpty)
  }

}
