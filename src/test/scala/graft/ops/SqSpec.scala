package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[Sq]] — int8 scalar quantization: code range, reconstruction error
  * bound, degenerate dims, and the rerank's exactness guarantee. */
class SqSpec extends SparkSuite {
  import spark.implicits._

  private def corpus(seed: Long, n: Int, dim: Int = 8) = {
    val rnd = new scala.util.Random(seed)
    (0 until n)
      .map(i => (i.toLong, Seq.fill(dim)(rnd.nextFloat() * 2f - 1f)))
      .toDF("vec_id", "embedding")
  }

  test("codes stay in [0,255]; reconstruction error within half a step") {
    val df = corpus(5L, 80)
    val m = Sq.train(df, "embedding", 8)
    val rows = df
      .withColumn("codes", Sq.encodeExpr(col("embedding"), m))
      .withColumn("rec", Sq.reconstructExpr(col("codes"), m))
      .select("embedding", "codes", "rec")
      .as[(Seq[Float], Seq[Long], Seq[Double])].collect()
    rows.foreach { case (v, codes, rec) =>
      assert(codes.forall(c => c >= 0 && c <= 255))
      v.indices.foreach { i =>
        val step = (m.maxs(i) - m.mins(i)) / 255.0
        assert(math.abs(v(i) - rec(i)) <= step / 2 + 1e-9,
          s"dim $i error ${math.abs(v(i) - rec(i))} exceeds half-step $step")
      }
    }
  }

  test("a degenerate dimension encodes to 0 and reconstructs the constant") {
    val df = Seq((1L, Seq(3.5f, 1f)), (2L, Seq(3.5f, -1f)))
      .toDF("vec_id", "embedding")
    val m = Sq.train(df, "embedding", 2)
    val r = df.withColumn("codes", Sq.encodeExpr(col("embedding"), m))
      .withColumn("rec", Sq.reconstructExpr(col("codes"), m))
      .select("codes", "rec").as[(Seq[Long], Seq[Double])].collect()
    assert(r.forall(_._1.head == 0L))
    assert(r.forall(x => math.abs(x._2.head - 3.5) < 1e-9))
  }

  test("with a full shortlist the rerank IS brute force (exact sims)") {
    val df = corpus(9L, 60)
    val m = Sq.train(df, "embedding", 8)
    val q = df.where($"vec_id" < 4)
    val got = Sq.topKRerank(q, df, "vec_id", "embedding", m,
        k = 5, shortlist = 60)
      .select("query_id", "neighbor_id", "sim", "rank")
      .orderBy("query_id", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    val want = Similarity.bruteForceTopK(q, df, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id", "sim", "rank")
      .orderBy("query_id", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(got == want,
      "a shortlist covering the corpus must reproduce the exact answer")
  }
}
