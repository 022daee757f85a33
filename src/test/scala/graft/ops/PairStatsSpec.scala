package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[MinHashLsh.candidateStats]] / [[MinHashLsh.candidatePairStats]] —
  * the measure-don't-assert faces of the shingle-pair scale
  * adjudication. The counts must equal an INDEPENDENT driver-side
  * replay of the candidate rules (prefix overlap + size filters for the
  * blocked faces, capped bucket arithmetic for LSH): the Spark builders
  * are shared with the operators, so this spec is what pins the
  * documented candidate semantics themselves. */
class PairStatsSpec extends SparkSuite {
  import spark.implicits._

  private def corpus = {
    val rnd = new scala.util.Random(7)
    val base = Seq.fill(36)(Seq.fill(25)(s"w${rnd.nextInt(150)}").mkString(" "))
    (base.zipWithIndex.map { case (t, i) => (i.toLong, s"s${i % 3}", t) } ++
      base.take(6).zipWithIndex.map { case (t, i) =>
        (100L + i, s"s${i % 3}", t.replaceFirst("w\\d+", "wCHANGED")) } ++
      Seq((200L, "s3", base.head), (201L, "s3", base(1)),
        (202L, "s3", ""), (203L, "s0", "")))
      .toDF("doc_id", "source", "text")
  }

  /** Driver-side shingle-hash sets: same xxhash64-of-shingles frame the
    * operators build, collected. */
  private def shSets: Map[Long, (String, Seq[Long])] =
    corpus.select($"doc_id", $"source",
        sort_array(transform(
          graft.functions.TextFunctions.shingles($"text", 3),
          s => xxhash64(s))).as("sh"))
      .as[(Long, String, Seq[Long])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  private val den = 1000000L
  private def numOf(t: Double) = math.max(0L, math.floor(t * den).toLong - 1L)
  private def ceilTn(num: Long, n: Long) = (num * n + den - 1L) / den
  private def prefix(sh: Seq[Long], num: Long): Seq[Long] =
    sh.take(math.max(0, (sh.length - ceilTn(num, sh.length) + 1).toInt))

  private def statsOf(containment: Boolean, t: Double, cutoff: Int) =
    MinHashLsh.candidateStats(corpus, "doc_id", "text", "source",
        containment = containment, threshold = t, smallBlockCutoff = cutoff)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head

  test("jaccard candidate counts equal the naive prefix-filter replay") {
    for (t <- Seq(0.12, 0.5); cutoff <- Seq(3, 10)) {
      val sets = shSets
      val blocks = sets.groupBy(_._2._1)
      val num = numOf(t)
      val (smallB, largeB) = blocks.partition(_._2.size <= cutoff)
      val candSmall = smallB.values.map(b =>
        b.size.toLong * (b.size - 1) / 2).sum
      val candLarge = largeB.values.map { b =>
        val ds = b.toSeq.map { case (id, (_, sh)) => (id, sh) }
        (for {
          (ia, sa) <- ds; (ib, sb) <- ds
          if ia < ib
          na = sa.length.toLong; nb = sb.length.toLong
          if na * den >= num * nb && nb * den >= num * na
          if prefix(sa, num).toSet.intersect(prefix(sb, num).toSet).nonEmpty
        } yield (ia, ib)).distinct.size.toLong
      }.sum
      val (nDocs, nBlocks, maxBlock, s, l, total) =
        statsOf(containment = false, t, cutoff)
      assert(nDocs == sets.size && nBlocks == blocks.size &&
        maxBlock == blocks.values.map(_.size).max)
      assert(s == candSmall, s"small side at t=$t cutoff=$cutoff")
      assert(l == candLarge, s"large side at t=$t cutoff=$cutoff")
      assert(total == candSmall + candLarge)
    }
  }

  test("containment candidate counts equal the asymmetric replay") {
    for (t <- Seq(0.5, 0.8); cutoff <- Seq(3, 10)) {
      val sets = shSets
      val blocks = sets.groupBy(_._2._1)
      val num = numOf(t)
      val (smallB, largeB) = blocks.partition(_._2.size <= cutoff)
      // all-pairs fast path: nonempty query side × every other doc
      val candSmall = smallB.values.map { b =>
        val nonEmpty = b.count(_._2._2.nonEmpty).toLong
        nonEmpty * (b.size - 1)
      }.sum
      val candLarge = largeB.values.map { b =>
        val ds = b.toSeq.map { case (id, (_, sh)) => (id, sh) }
        (for {
          (ia, sa) <- ds; (ib, sb) <- ds
          if ia != ib
          na = sa.length.toLong; nb = sb.length.toLong
          if nb * den >= num * na
          if prefix(sa, num).toSet.intersect(sb.toSet).nonEmpty
        } yield (ia, ib)).distinct.size.toLong
      }.sum
      val (nDocs, _, _, s, l, total) = statsOf(containment = true, t, cutoff)
      assert(nDocs == sets.size)
      assert(s == candSmall, s"small side at t=$t cutoff=$cutoff")
      assert(l == candLarge, s"large side at t=$t cutoff=$cutoff")
      assert(total == candSmall + candLarge)
    }
  }

  test("candidate volume bounds the verified output on both faces") {
    for (t <- Seq(0.12, 0.5); cutoff <- Seq(3, 512)) {
      val (_, _, _, _, _, jc) = statsOf(containment = false, t, cutoff)
      val jv = MinHashLsh.jaccardBlocked(corpus, "doc_id", "text",
        "source", threshold = t, smallBlockCutoff = cutoff).count()
      assert(jv <= jc, s"jaccard verified $jv > candidates $jc")
      val (_, _, _, _, _, cc) = statsOf(containment = true, t, cutoff)
      val cv = MinHashLsh.containmentBlocked(corpus, "doc_id", "text",
        "source", threshold = t, smallBlockCutoff = cutoff).count()
      assert(cv <= cc, s"containment verified $cv > candidates $cc")
    }
  }

  test("LSH bucket-pair arithmetic equals the bucket-group replay and " +
    "bounds the distinct output") {
    for (maxBucket <- Seq(2, 1024)) {
      val stats = MinHashLsh.candidatePairStats(corpus, "doc_id", "text",
          maxBucket = maxBucket)
        .as[(Long, Long, Long)].collect().head
      val groups = MinHashLsh.bandBuckets(
          MinHashLsh.signatures(corpus, "doc_id", "text"), "doc_id")
        .groupBy($"band", $"bucket").agg(count(lit(1)).as("n"))
        .where($"n" > 1).select($"n").as[Long].collect()
      val expected = groups.map(n =>
        if (n <= maxBucket) n * (n - 1) / 2 else n - 1).sum
      assert(stats._2 == groups.length, "bucket count")
      assert(stats._3 == expected, s"bucket-pair count at cap $maxBucket")
      val out = MinHashLsh.candidatePairs(corpus, "doc_id", "text",
        maxBucket = maxBucket).count()
      assert(out <= stats._3, s"distinct output $out > expanded ${stats._3}")
    }
  }
}
