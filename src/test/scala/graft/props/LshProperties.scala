package graft.props

import java.security.MessageDigest

import graft.SparkSuite
import graft.ops.{MinHashLsh, SimHashDedup}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The LSH pipelines re-implemented as sequential Scala models and compared
  * exactly with the distributed versions on generated corpora — the hashes
  * are deterministic (md5), so candidate sets must match member for member,
  * independent of Spark AND of the DuckDB oracle. */
class LshProperties extends SparkSuite {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private val vocab = Seq("spark", "join", "data", "the", "table", "scan",
    "merge", "row", "key", "sort")
  private val docGen = Gen.listOfN(30, Gen.choose(5, 25).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" "))))

  private def modelShingles(text: String, k: Int): Seq[String] =
    text.split(" ").toSeq.sliding(k).filter(_.size == k)
      .map(_.mkString(" ")).toSeq.distinct

  test("minhash LSH candidate pairs equal the sequential banding model") {
    (0 until 4).flatMap(i => docGen(Gen.Parameters.default, Seed(7L + i)))
      .foreach { texts =>
        val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        // sequential model
        val buckets = docs.flatMap { case (id, t) =>
          val sh = modelShingles(t, 3)
          if (sh.isEmpty) Nil
          else {
            val sig = (0 until 16).map(s =>
              sh.map(x => md5hex(s"$s:$x")).min)
            (0 until 4).map(b =>
              ((b, md5hex(sig.slice(b * 4, b * 4 + 4).mkString("|"))), id))
          }
        }
        val modelPairs = buckets.groupBy(_._1).values.flatMap { grp =>
          val ids = grp.map(_._2).sorted
          for (a <- ids; b <- ids if a < b) yield (a, b)
        }.toSet

        val got = MinHashLsh
          .candidatePairs(docs.toDF("doc_id", "text"), "doc_id", "text")
          .as[(Long, Long)].collect().toSet
        assert(got == modelPairs, s"docs=$texts")
      }
  }

  test("simhash near-dup pairs equal the all-pairs hamming model") {
    def hash16(tok: String): Int = {
      val h = md5hex(tok).take(4)
      h.foldLeft(0)((acc, c) => acc * 16 + Integer.parseInt(c.toString, 16))
    }
    def simhash(text: String): Long = {
      val hs = text.split(" ").toSeq.map(hash16)
      (0 until 16).map { j =>
        val v = hs.map(h => ((h >> j) & 1) * 2 - 1).sum
        if (v >= 0) 1L << j else 0L
      }.sum
    }
    (0 until 3).flatMap(i => docGen(Gen.Parameters.default, Seed(42L + i)))
      .foreach { texts =>
        val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        val sh = docs.map { case (id, t) => id -> simhash(t) }
        val modelPairs = (for {
          (a, ha) <- sh; (b, hb) <- sh if a < b
          if java.lang.Long.bitCount(ha ^ hb) <= 1
        } yield (a, b, java.lang.Long.bitCount(ha ^ hb))).toSet

        val got = SimHashDedup
          .nearDuplicates(docs.toDF("doc_id", "text"), "doc_id", "text", 1)
          .as[(Long, Long, Int)].collect().toSet
        assert(got == modelPairs, s"docs=$texts")
      }
  }

  test("degenerate corpus (10k identical docs) stays linear, never quadratic") {
    // 10k copies of one text collapse every band into ONE bucket; all-pairs
    // would be ~2×10⁸ pair structs on a single task. The star fallback must
    // keep output O(n) while still connecting every doc into the cluster.
    val n = 10000
    val docs = (0 until n).map(i => (i.toLong, "the spark table scan merge"))
      .toDF("doc_id", "text")
    val pairs = MinHashLsh
      .candidatePairs(docs, "doc_id", "text", maxBucket = 1024)
      .as[(Long, Long)].collect()
    assert(pairs.length == n - 1) // star around doc 0, deduped across bands
    val connected = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(connected.size == n) // every doc linked into the duplicate cluster
    assert(pairs.forall(_._1 == 0L)) // hub is the smallest id

    val sim = SimHashDedup
      .nearDuplicates(docs, "doc_id", "text", 1, maxBucket = 1024)
      .as[(Long, Long, Int)].collect()
    assert(sim.length == n - 1)
    assert(sim.forall(_._3 == 0)) // identical docs: hamming 0
    assert(sim.flatMap(p => Seq(p._1, p._2)).toSet.size == n)
  }

  test("capped simhash buckets preserve duplicate-cluster components") {
    // With a tiny cap every bucket takes the bounded path; the connected
    // components of the returned pair graph must equal the all-pairs
    // hamming-model components — the guarantee dedup actually consumes.
    def hash16m(tok: String): Int = {
      val h = md5hex(tok).take(4)
      h.foldLeft(0)((acc, c) => acc * 16 + Integer.parseInt(c.toString, 16))
    }
    def simhash(text: String): Long = {
      val hs = text.split(" ").toSeq.map(hash16m)
      (0 until 16).map { j =>
        val v = hs.map(h => ((h >> j) & 1) * 2 - 1).sum
        if (v >= 0) 1L << j else 0L
      }.sum
    }
    def comps(ids: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
      def find(x: Long): Long = {
        var r = x; while (parent(r) != r) r = parent(r); r
      }
      pairs.foreach { case (a, b) =>
        val ra = find(a); val rb = find(b)
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      ids.map(i => i -> find(i)).toMap
    }
    (0 until 3).flatMap(i => docGen(Gen.Parameters.default, Seed(99L + i)))
      .foreach { texts =>
        val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        val sh = docs.map { case (id, t) => id -> simhash(t) }
        val modelPairs = for {
          (a, ha) <- sh; (b, hb) <- sh
          if a < b && java.lang.Long.bitCount(ha ^ hb) <= 1
        } yield (a, b)
        val got = SimHashDedup
          .nearDuplicates(docs.toDF("doc_id", "text"), "doc_id", "text",
            maxHamming = 1, maxBucket = 3)
          .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
        // every returned pair genuinely qualifies…
        val shMap = sh.toMap
        assert(got.forall { case (a, b) =>
          java.lang.Long.bitCount(shMap(a) ^ shMap(b)) <= 1 })
        // …and the component structure is identical to the full model
        val ids = docs.map(_._1)
        assert(comps(ids, got) == comps(ids, modelPairs), s"docs=$texts")
      }
  }

  test("bucket cap keeps exact all-pairs semantics below the threshold") {
    // 40 identical docs with cap 64 → all-pairs path must be untouched
    val docs = (0 until 40).map(i => (i.toLong, "the spark table scan merge"))
      .toDF("doc_id", "text")
    val pairs = MinHashLsh
      .candidatePairs(docs, "doc_id", "text", maxBucket = 64)
      .as[(Long, Long)].collect()
    assert(pairs.length == 40 * 39 / 2)
  }

  test("corpus signature is mergeable: sketch of union = min of sketches") {
    val mk = (ids: Seq[Long], t: String) => ids.map(i => (i, t + " " + i))
    val docs = (mk(Seq(1L, 2L), "the quick brown fox jumps over dogs") ++
      mk(Seq(3L, 4L), "an entirely different shingle universe here"))
      .toDF("doc_id", "text")
    def sig(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val row = MinHashLsh.corpusSignature(
        MinHashLsh.signatures(df, "doc_id", "text")).collect().head
      (0 until 16).map(i => row.getString(row.fieldIndex(s"mh$i")))
    }
    val whole = sig(docs)
    val a = sig(docs.where($"doc_id" <= 2))
    val b = sig(docs.where($"doc_id" > 2))
    val merged = a.zip(b).map { case (x, y) => if (x <= y) x else y }
    assert(merged == whole,
      "columnwise min of shard sketches equals the whole-corpus sketch")
    // identical corpora agree on every slot; disjoint ones on almost none
    assert(sig(docs) == sig(docs))
  }
}
