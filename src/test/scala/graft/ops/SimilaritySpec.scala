package graft.ops

import graft.SparkSuite
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  private def vec(xs: Float*): Seq[Float] = xs.toSeq

  test("cosine of identical / orthogonal / opposite vectors") {
    val df = Seq(
      (vec(1f, 0f), vec(1f, 0f)),
      (vec(1f, 0f), vec(0f, 1f)),
      (vec(1f, 0f), vec(-1f, 0f))).toDF("a", "b")
    val sims = df.select(VectorFunctions.cosine(col("a"), col("b")))
      .as[Double].collect()
    assert(math.abs(sims(0) - 1.0) < 1e-9)
    assert(math.abs(sims(1)) < 1e-9)
    assert(math.abs(sims(2) + 1.0) < 1e-9)
  }

  test("bruteForceTopK returns the true nearest neighbors ranked") {
    val emb = Seq(
      (0L, vec(1f, 0f, 0f)),
      (1L, vec(0.9f, 0.1f, 0f)), // closest to 0
      (2L, vec(0.5f, 0.5f, 0f)),
      (3L, vec(0f, 1f, 0f)),
      (4L, vec(-1f, 0f, 0f))).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(
      emb.where(col("vec_id") === 0), emb, "vec_id", "embedding", 2)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    assert(out.map(_._1).toSeq == Seq(1L, 2L))
  }

  test("ivfTopK only searches the query's cell") {
    val emb = Seq(
      (0L, vec(1f, 0f), 0), (1L, vec(0.99f, 0.01f), 1), // near but other cell
      (2L, vec(0.5f, 0.5f), 0), (3L, vec(0f, 1f), 0)).toDF(
      "vec_id", "embedding", "label")
    val out = Similarity.ivfTopK(
      emb.where(col("vec_id") === 0), emb, "vec_id", "embedding", "label", 2)
      .select("neighbor_id").as[Long].collect().toSet
    assert(out == Set(2L, 3L)) // 1 excluded: different cell
  }

  test("lshTopK neighbors are genuine same-bucket cosine matches") {
    val emb = (0 until 50).map { i =>
      val angle = (i % 5) * 0.1
      (i.toLong, vec(math.cos(angle).toFloat, math.sin(angle).toFloat,
        (i % 3).toFloat * 0.01f))
    }.toDF("vec_id", "embedding")
    val out = Similarity.lshTopK(emb, "vec_id", "embedding",
      dim = 3, numPlanes = 4, k = 3)
    val rows = out.select("query_id", "sim").as[(Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= -1.0000001) && rows.forall(_._2 <= 1.0000001))
  }

  test("codegen FloatVectorDot equals the zip_with/aggregate formulation") {
    val vecs = (0 until 200).map { i =>
      (Seq.tabulate(64)(j => (math.sin(i * 64 + j)).toFloat),
        Seq.tabulate(64)(j => (math.cos(i * 64 + j)).toFloat))
    }.toDF("a", "b")
    val fused = vecs.select(VectorFunctions.dot(col("a"), col("b")))
      .as[Double].collect()
    val composed = vecs.select(VectorFunctions.dotComposed(col("a"), col("b")))
      .as[Double].collect()
    assert(fused.toSeq == composed.toSeq) // bitwise: same accumulation order
  }

  test("srpBucket is deterministic across evaluations") {
    val emb = Seq((0L, vec(1f, 2f, 3f)), (1L, vec(-1f, 0f, 1f)))
      .toDF("vec_id", "embedding")
    val b1 = emb.select(VectorFunctions.srpBucket(col("embedding"), 8, 3))
      .as[Long].collect().toSeq
    val b2 = emb.select(VectorFunctions.srpBucket(col("embedding"), 8, 3))
      .as[Long].collect().toSeq
    assert(b1 == b2)
  }
}
