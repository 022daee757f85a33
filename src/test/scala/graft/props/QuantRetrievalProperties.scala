package graft.props

import graft.SparkSuite
import graft.ops.{LineDedup, Sq}
import org.apache.spark.sql.functions._

/** Generated-input differential properties for the round's quantization
  * and retrieval ops: plain-Scala references recompute every answer —
  * including the approximate SHORTLIST stage, whose contents (not just the
  * final ranking) must match for the oracle replays to stay honest. */
class QuantRetrievalProperties extends SparkSuite {
  import spark.implicits._

  // integer-valued floats: products and sums are exact in double, so the
  // engine/reference comparison is bit-for-bit even through cosine
  private def corpus(seed: Long, n: Int, dim: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Seq.fill(dim)((rnd.nextInt(9) - 4).toFloat)))
      .filter(_._2.exists(_ != 0f))
  }

  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    var dp = 0.0; var na = 0.0; var nb = 0.0
    a.indices.foreach { i =>
      dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
    }
    dp / (math.sqrt(na) * math.sqrt(nb))
  }

  test("SQ8 topKRerank equals the scalar reference, shortlist ties included") {
    for (seed <- Seq(41L, 42L, 43L)) {
      val rows = corpus(seed, 50, 6)
      val df = rows.toDF("vec_id", "embedding")
      val m = Sq.train(df, "embedding", 6)
      val got = Sq.topKRerank(df.where($"vec_id" < 4), df, "vec_id",
          "embedding", m, k = 3, shortlist = 8)
        .orderBy("query_id", "rank")
        .select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().toSeq

      def encode(v: Seq[Float]): Seq[Long] = v.indices.map { i =>
        val lo = m.mins(i); val hi = m.maxs(i)
        if (hi == lo) 0L
        else math.floor((v(i).toDouble - lo) * 255.0 / (hi - lo) + 0.5).toLong
      }
      def rec(c: Seq[Long]): Seq[Double] = c.indices.map { i =>
        val lo = m.mins(i); val hi = m.maxs(i)
        lo + c(i).toDouble * (hi - lo) / 255.0
      }
      val want = rows.filter(_._1 < 4).flatMap { case (qid, qv) =>
        val qd = qv.map(_.toDouble)
        val short = rows.filter(_._1 != qid)
          .map { case (nid, nv) => (nid, cos(qd, rec(encode(nv))), nv) }
          .sortBy { case (nid, asim, _) => (-asim, nid) }
          .take(8)
        short.map { case (nid, _, nv) => (nid, cos(qd, nv.map(_.toDouble))) }
          .sortBy { case (nid, sim) => (-sim, nid) }
          .take(3).zipWithIndex
          .map { case ((nid, _), r) => (qid, nid, r + 1) }
      }
      assert(got == want, s"seed $seed diverged")
    }
  }

  test("LineDedup equals the scalar keep-first on random repeated lines") {
    for (seed <- Seq(51L, 52L)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("aa", "bb", "cc", "dd", "ee")
      val rows = (0 until 40).map(i =>
        (i.toLong, Seq.fill(rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))))
      val got = LineDedup.dedupLines(rows.toDF("doc_id", "lines"),
          "doc_id", col("lines"))
        .orderBy("doc_id").select("doc_id", "n_kept", "text_clean")
        .as[(Long, Long, String)].collect().toSeq
      val want = rows.map { case (id, ls) =>
        val kept = ls.zipWithIndex
          .filter { case (x, i) => ls.indexOf(x) == i }.map(_._1)
        (id, kept.size.toLong, kept.mkString("\n"))
      }
      assert(got == want, s"seed $seed diverged")
    }
  }

  test("RRF fusion: rank arithmetic and cross-source ties match a reference") {
    // two synthetic rank lists with engineered overlap and the symmetric
    // tie (text-only rank r vs vector-only rank r → equal rrf → id order)
    val text = Seq(("qa", 10L, 1L), ("qa", 11L, 2L), ("qa", 12L, 3L))
    val vec = Seq(("qa", 11L, 1L), ("qa", 13L, 2L), ("qa", 14L, 3L))
    val t = text.toDF("qid", "doc_id", "trank")
    val v = vec.toDF("qid", "doc_id", "vrank")
    val fused = t.join(v, Seq("qid", "doc_id"), "full_outer")
      .select(col("qid"), col("doc_id"),
        coalesce(col("trank"), lit(0L)).as("tr"),
        coalesce(col("vrank"), lit(0L)).as("vr"))
      .withColumn("rrf",
        when(col("tr") > 0, lit(1.0) / (lit(60L) + col("tr"))).otherwise(lit(0.0)) +
        when(col("vr") > 0, lit(1.0) / (lit(60L) + col("vr"))).otherwise(lit(0.0)))
      .orderBy(col("rrf").desc, col("doc_id"))
      .select("doc_id").as[Long].collect().toSeq
    // reference: 11 leads (both lists), then 10 vs 13 tie on 1/61? no —
    // 10 has 1/61 (text rank 1), 13 has 1/62 (vec rank 2); the true tie is
    // 12 (text 3) vs 14 (vec 3): equal 1/63 → smaller id first
    val ref = Map(
      10L -> 1.0 / 61, 11L -> (1.0 / 62 + 1.0 / 61), 12L -> 1.0 / 63,
      13L -> 1.0 / 62, 14L -> 1.0 / 63)
    val want = ref.toSeq.sortBy { case (id, s) => (-s, id) }.map(_._1)
    assert(fused == want)
    assert(fused.indexOf(12L) < fused.indexOf(14L),
      "equal-rrf cross-source tie must break to the smaller id")
  }
}
