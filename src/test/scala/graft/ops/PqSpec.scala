package graft.ops

import graft.SparkSuite
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** Product quantization: codes bounded by the codebook, encoding a pure
  * deterministic expression, ADC search recovers planted cluster
  * structure, and recall against brute force clears the board query's
  * margin on the real test embeddings. */
class PqSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("codes are m cells each within [0, k); encoding is deterministic") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val model = Pq.train(emb, "vec_id", "embedding", m = 8, k = 16, iters = 2)
    assert(model.codebooks.forall(_.length == 16) && model.subDim == 8)
    val codes = emb.select($"vec_id",
      Pq.encodeExpr($"embedding", model).as("codes")).cache()
    assert(codes.where(size($"codes") =!= 8).count() == 0)
    assert(codes.where(exists($"codes", c => c < 0 || c >= 16)).count() == 0)
    val again = emb.repartition(7).select($"vec_id",
      Pq.encodeExpr($"embedding", model).as("codes"))
    assert(codes.exceptAll(again).count() == 0)
    codes.unpersist()
  }

  test("ADC search separates well-separated planted clusters perfectly") {
    // two tight clusters on orthogonal axes: every query's true top-2 are
    // its own cluster mates, and PQ cannot confuse them
    val vecs = ((0 until 3).map(i => (i.toLong,
      Array.tabulate(16)(j => if (j < 8) 1f + i * 0.01f else 0.001f * i))) ++
      (10 until 13).map(i => (i.toLong,
        Array.tabulate(16)(j => if (j >= 8) 1f + i * 0.01f else 0.001f * i))))
      .toDF("vec_id", "embedding")
    val unit = vecs.select($"vec_id",
      VectorFunctions.unit($"embedding").as("embedding"))
    val model = Pq.train(unit, "vec_id", "embedding", m = 4, k = 4, iters = 3)
    val codes = unit.select($"vec_id",
      Pq.encodeExpr($"embedding", model).as("codes"))
    val top2 = Pq.adcTopK(unit, codes, "vec_id", "embedding", model, 2)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    top2.foreach { case (q, n) =>
      assert((q < 10) == (n < 10), s"query $q crossed clusters to $n")
    }
  }

  test("shortlist+rerank recall@3 clears the board bound with margin") {
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select($"vec_id", VectorFunctions.unit($"embedding").as("embedding"))
      .localCheckpoint(true)
    val model = Pq.train(emb, "vec_id", "embedding", m = 8, k = 16, iters = 2)
    val codes = emb.select($"vec_id",
      Pq.encodeExpr($"embedding", model).as("codes"))
    val q = emb.where($"vec_id" < 10)
    val ann = Pq.adcTopKRerank(q, codes, emb, "vec_id", "embedding", model,
      k = 3, shortlist = 60).select($"query_id", $"neighbor_id")
    val exact = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 3)
      .select($"query_id", $"neighbor_id")
    val slots = exact.count().toDouble
    val hits = ann.join(exact, Seq("query_id", "neighbor_id")).count()
    val recall = hits / slots
    info(f"PQ+rerank recall@3 = $recall%.3f over ${slots.toInt} slots")
    assert(recall >= 0.50, f"recall $recall%.3f under the board bound")
    // a wider shortlist can only help (monotone refinement)
    val wider = Pq.adcTopKRerank(q, codes, emb, "vec_id", "embedding", model,
      k = 3, shortlist = 200).select($"query_id", $"neighbor_id")
    val hitsWide = wider.join(exact, Seq("query_id", "neighbor_id")).count()
    assert(hitsWide >= hits)
  }

  test("ivfPqTopK scores only probed cells and clears the board bound") {
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select($"vec_id", VectorFunctions.unit($"embedding").as("embedding"))
      .localCheckpoint(true)
    val cents = KMeans.fit(emb, "vec_id", "embedding", 8, 2)
    val model = Pq.train(emb, "vec_id", "embedding", m = 8, k = 16, iters = 2)
    val indexed = emb
      .withColumn("cell", KMeans.assignExpr($"embedding", cents))
      .withColumn("codes", Pq.encodeExpr($"embedding", model))
      .localCheckpoint(true)
    val q = emb.where($"vec_id" < 10)
    val ann = Pq.ivfPqTopK(q, indexed, "vec_id", "embedding", cents, model,
      k = 3, nprobe = 4, shortlist = 80)
      .select($"query_id", $"neighbor_id").cache()
    // every returned neighbor lives in one of its query's probed cells
    val probed = q.select($"vec_id".as("query_id"),
      explode(KMeans.probeExpr($"embedding", cents, 4)).as("cell"))
    val cellsOf = indexed.select($"vec_id".as("neighbor_id"), $"cell")
    val escaped = ann.join(cellsOf, Seq("neighbor_id"))
      .join(probed, Seq("query_id", "cell"), "left_anti")
    assert(escaped.count() == 0, "a neighbor came from an unprobed cell")
    val exact = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 3)
      .select($"query_id", $"neighbor_id")
    val recall = ann.join(exact, Seq("query_id", "neighbor_id")).count()
      .toDouble / exact.count()
    info(f"IVF-PQ recall@3 = $recall%.3f")
    assert(recall >= 0.40)
    ann.unpersist()
  }
}
