package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Bloom membership prefilter + deterministic corpus sharding. The
  * load-bearing properties: the bloom can over-admit but NEVER miss a
  * present key (admissible invariant); the epoch shuffle is a permutation
  * with dense in-shard positions, byte-stable under repartitioning; split
  * assignment is a pure projection whose verdicts survive corpus growth. */
class BloomShardsSpec extends SparkSuite {
  import spark.implicits._

  private def docs = (1 to 400).map { i =>
    (i.toLong, s"text body number ${i % 120} tail", s"lang${i % 3}")
  }.toDF("doc_id", "text", "lang")

  test("bloom prefilter: no false negatives, novel docs mostly screened out") {
    val idx = docs.where($"doc_id" <= 300)
    val batch = docs.where($"doc_id" <= 300 && $"doc_id" % 10 === 0)
      .select($"doc_id", $"text")
      .unionAll(docs.where($"doc_id" > 300)
        .select($"doc_id",
          concat($"text", lit(" unseen "), $"doc_id".cast("string")).as("text")))
    val out = Bloom.prefilterDedup(batch, idx, "doc_id", "text").cache()
    // the classic guarantee: a present fingerprint is always a bloom hit
    assert(out.where(!$"admissible").count() == 0)
    assert(out.where($"present" && !$"bloom_hit").count() == 0)
    // every re-ingested doc (present content) hits
    assert(out.where($"doc_id" <= 300).count() > 0)
    assert(out.where($"doc_id" <= 300 && !$"present").count() == 0)
    // at m=4096 bits and ~120 distinct index fps, most novel docs miss —
    // the prefilter actually saves the exact join for the common case
    val novel = out.where($"doc_id" > 300)
    assert(novel.where(!$"bloom_hit").count() > novel.count() / 2)
    out.unpersist()
  }

  test("bloom bits are bounded and partition-independent") {
    val fps = docs.select(md5($"text").as("fp"))
    val a = Bloom.bits(fps, 2).as[(Int, Int)].collect().toSet
    val b = Bloom.bits(fps.repartition(7), 2).as[(Int, Int)].collect().toSet
    assert(a == b)
    assert(a.forall { case (r, bit) => r >= 0 && r < 2 && bit >= 0 && bit < 4096 })
  }

  test("epochShuffle is a permutation: dense per-shard positions, all rows dealt") {
    val out = Shards.epochShuffle(docs, "doc_id", seed = 1L, nShards = 8).cache()
    assert(out.count() == 400)
    assert(out.select("doc_id").distinct().count() == 400)
    // pos is dense 0..n-1 within each shard
    val bad = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), max($"pos").as("mx"), min($"pos").as("mn"),
        count_distinct($"pos").as("d"))
      .where($"mn" =!= 0 || $"mx" =!= $"n" - 1 || $"d" =!= $"n")
    assert(bad.count() == 0)
    // deterministic under repartitioning
    val again = Shards.epochShuffle(docs.repartition(13), "doc_id", 1L, 8)
    assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0)
    // a different seed re-deals the epoch
    val other = Shards.epochShuffle(docs, "doc_id", seed = 2L, nShards = 8)
    assert(out.intersect(other).count() < 400)
    out.unpersist()
  }

  test("writeEpoch materializes shard dirs with rows physically in deal order") {
    val out = java.nio.file.Files.createTempDirectory("epoch").toFile
      .getAbsolutePath
    Shards.writeEpoch(docs, "doc_id", seed = 5L, nShards = 4, out)
    val deal = Shards.epochShuffle(docs, "doc_id", 5L, 4)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._2).map { case (s, rows) =>
        s -> rows.sortBy(_._3).map(_._1).toSeq }
    for (s <- 0 until 4) {
      // a shard dir holds ONE file whose physical row order IS the deal
      val dir = new java.io.File(out, s"shard=$s")
      assert(dir.listFiles().count(_.getName.endsWith(".parquet")) == 1)
      val rows = spark.read.parquet(dir.getAbsolutePath)
        .select("doc_id").as[Long].collect().toSeq
      assert(rows == deal(s.toLong), s"shard $s order mismatch")
    }
  }

  test("splitAssign: pure projection, growth-stable, percentages honored") {
    val out = Shards.splitAssign(docs, "doc_id", seed = 9L,
      Seq(("train", 90), ("val", 5), ("test", 5))).cache()
    assert(out.count() == 400)
    val byBucket = out.where(
      ($"bucket" < 90 && $"split" =!= "train") ||
      ($"bucket" >= 90 && $"bucket" < 95 && $"split" =!= "val") ||
      ($"bucket" >= 95 && $"split" =!= "test"))
    assert(byBucket.count() == 0)
    // growth stability: the first half's verdicts are unchanged when the
    // second half arrives (a doc's split NEVER flips as the corpus grows)
    val half = Shards.splitAssign(docs.where($"doc_id" <= 200), "doc_id", 9L,
      Seq(("train", 90), ("val", 5), ("test", 5)))
    assert(half.exceptAll(out.where($"doc_id" <= 200)).count() == 0)
    intercept[IllegalArgumentException] {
      Shards.splitAssign(docs, "doc_id", 9L, Seq(("a", 50), ("b", 40)))
    }
    out.unpersist()
  }

  test("splitAssignByKey: all rows sharing a key share a split; agrees with splitAssign on id keys") {
    // 400 docs in 40 ten-member clusters — the near-dup-cluster shape
    val clustered = docs.withColumn("cluster", $"doc_id" % 40)
    val out = Shards.splitAssignByKey(clustered, "doc_id", "cluster",
      seed = 9L, Seq(("train", 90), ("val", 5), ("test", 5))).cache()
    assert(out.count() == 400)
    // THE invariant: zero clusters straddle two splits
    val straddlers = out.groupBy("split_key")
      .agg(countDistinct($"split").as("n"))
      .where($"n" > 1)
    assert(straddlers.count() == 0, "a cluster straddled splits")
    // keying on the id column reduces to the per-doc split exactly
    val byId = Shards.splitAssignByKey(docs, "doc_id", "doc_id", 9L,
      Seq(("train", 90), ("val", 5), ("test", 5)))
      .drop("split_key")
    val plain = Shards.splitAssign(docs, "doc_id", 9L,
      Seq(("train", 90), ("val", 5), ("test", 5)))
    assert(byId.exceptAll(plain).count() == 0)
    out.unpersist()
  }

  test("heavyHitters: one-sided recall — every true heavy hitter is admitted") {
    val skewed = (1 to 50).map(i => (i.toLong, "alpha " * 20 + s"rare$i"))
      .toDF("doc_id", "text")
    val out = Sketches.heavyHitters(skewed, "text", k = 3).cache()
    // 'alpha' is ~95% of the stream — it MUST be in the candidate set
    assert(out.where($"term" === "alpha" && $"is_heavy").count() == 1)
    // every candidate satisfies the sketch bound est*k >= total, and the
    // true heavies are exactly the is_heavy rows
    assert(out.where($"exact_n" > $"cms_est").count() == 0)
    out.unpersist()
  }
}
