package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[Srp]] — sign-random-projection sketches over SQ8 codes. */
class SrpSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb =
    graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
  private lazy val model = Sq.train(emb, "embedding", 64)

  test("identical vectors sketch identically; sketches are deterministic") {
    val pl = Srp.planes(48, 64)
    val sk = emb.select(col("vec_id"),
      Srp.sketchExpr(Sq.encodeExpr(col("embedding"), model), pl).as("sk"))
    val once = sk.orderBy("vec_id").as[(Long, Long)].collect().toSeq
    val again = emb.repartition(7).select(col("vec_id"),
        Srp.sketchExpr(Sq.encodeExpr(col("embedding"), model), pl).as("sk"))
      .orderBy("vec_id").as[(Long, Long)].collect().toSeq
    assert(once == again)
    assert(once.map(_._2).distinct.size > 1, "sketches must discriminate")
  }

  test("hamming separates true neighbors from the field (the SRP signal)") {
    // this corpus's planted neighbors sit near cosine 0.3 — per-bit
    // agreement 1−θ/π ≈ 0.61 vs 0.5 — so per-query recall is noisy at 48
    // bits; the MECHANISM claim is aggregate separation: averaged over
    // queries, true top-3 neighbors must be meaningfully closer in
    // hamming than the candidate field
    val pl = Srp.planes(48, 64)
    val sk = emb.select(col("vec_id"),
        Srp.sketchExpr(Sq.encodeExpr(col("embedding"), model), pl).as("sk"))
      .as[(Long, Long)].collect().toMap
    val qs = emb.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(qs, emb, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sk(a) ^ sk(b))
    val top3 = exact.map { case (q, n) => ham(q, n).toDouble }
    val all = for {
      q <- sk.keys.toSeq if q < 10
      c <- sk.keys.toSeq if c != q
    } yield ham(q, c).toDouble
    val (mTop, mAll) = (top3.sum / top3.length, all.sum / all.length)
    assert(mTop < mAll - 2.0,
      s"true neighbors must sit closer in hamming: top3=$mTop field=$mAll")
  }

  test("rank output is exact-cosine ordered within the shortlist") {
    val out = Srp.topKRerank(emb.where(col("vec_id") < 3), emb, "vec_id",
      "embedding", model, 48, 3, 10)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    out.groupBy(_._1).values.foreach { rows =>
      val sims = rows.sortBy(_._4).map(_._3)
      assert(sims == sims.sorted.reverse, "sim must decrease with rank")
    }
  }
}
