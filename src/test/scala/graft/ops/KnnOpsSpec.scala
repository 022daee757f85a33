package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** [[KnnOps]] — kNN vote, nearest-centroid, and batch-hard triplet mining
  * on handcrafted geometry where every answer is checkable by eye. */
class KnnOpsSpec extends SparkSuite {
  import spark.implicits._

  // Axis-aligned unit vectors in 4-d: label = dominant axis. Cosine between
  // same-axis vectors is 1.0; across axes it is 0.0 — so every neighbor
  // relationship is unambiguous.
  private def axis(i: Int, d: Int = 4): Seq[Float] =
    Seq.tabulate(d)(j => if (j == i) 1f else 0f)

  // small perturbation keeps the dominant axis but makes sims distinct
  private def near(i: Int, eps: Float, d: Int = 4): Seq[Float] =
    Seq.tabulate(d)(j => if (j == i) 1f else eps)

  test("knnClassify: majority label of the k nearest wins") {
    // train: three clean axis-0 vectors, two axis-1; test vector near
    // axis 0 → 3-of-5 vote says label 0
    val train = Seq(
      (10L, axis(0), 0), (11L, near(0, 0.01f), 0), (12L, near(0, 0.02f), 0),
      (20L, axis(1), 1), (21L, near(1, 0.01f), 1))
      .toDF("vec_id", "embedding", "label")
    val test = Seq((1L, near(0, 0.05f), 0)).toDF("vec_id", "embedding", "label")
    val out = KnnOps.knnClassify(test, train, "vec_id", "embedding", "label", k = 5)
      .collect()
    assert(out.toSeq == Seq(Row(1L, 0, 0, true)))
  }

  test("knnClassify: vote ties break to the smaller label") {
    // k=4: two label-5 and two label-3 neighbors, all nearer than anything
    // else → tie 2-2 must pick label 3
    val train = Seq(
      (10L, near(0, 0.01f), 5), (11L, near(0, 0.02f), 5),
      (12L, near(0, 0.03f), 3), (13L, near(0, 0.04f), 3),
      (20L, axis(1), 1))
      .toDF("vec_id", "embedding", "label")
    val test = Seq((1L, axis(0), 3)).toDF("vec_id", "embedding", "label")
    val out = KnnOps.knnClassify(test, train, "vec_id", "embedding", "label", k = 4)
      .collect()
    assert(out.toSeq == Seq(Row(1L, 3, 3, true)))
  }

  test("knnClassify + centroidClassify: string labels work, ties break lexicographically") {
    // the tie-break must not assume numeric labels (it once negated the
    // label column, which null-ified strings under non-ANSI casts)
    val train = Seq(
      (10L, near(0, 0.01f), "fr"), (11L, near(0, 0.02f), "fr"),
      (12L, near(0, 0.03f), "en"), (13L, near(0, 0.04f), "en"),
      (20L, axis(1), "de"))
      .toDF("vec_id", "embedding", "label")
    val test = Seq((1L, axis(0), "en")).toDF("vec_id", "embedding", "label")
    // k=4: tie 2-2 between "fr" and "en" → lexicographically smaller "en"
    val knn = KnnOps.knnClassify(test, train, "vec_id", "embedding", "label",
      k = 4).collect()
    assert(knn.toSeq == Seq(Row(1L, "en", "en", true)))
    val cent = KnnOps.centroidClassify(test, train, "vec_id", "embedding",
      "label", dim = 4).collect()
    assert(cent.head.getString(2) != null, "string pred_label must not null out")
  }

  test("centroidClassify: per-label train means, argmax cosine, tie → small label") {
    val train = Seq(
      (10L, axis(0), 0), (11L, axis(0), 0),       // centroid = axis 0
      (20L, axis(1), 1), (21L, near(1, 0.1f), 1)) // centroid ≈ axis 1
      .toDF("vec_id", "embedding", "label")
    val test = Seq(
      (1L, near(0, 0.02f), 0),  // → label 0
      (2L, near(1, 0.02f), 0))  // → label 1 (misclassified on purpose)
      .toDF("vec_id", "embedding", "label")
    val out = KnnOps.centroidClassify(test, train, "vec_id", "embedding",
      "label", dim = 4).orderBy("vec_id").collect()
    assert(out.toSeq == Seq(Row(1L, 0, 0, true), Row(2L, 0, 1, false)))
  }

  test("tripletMine: hardest positive, hardest negative, margin flag, no self") {
    // anchor 1 (label 0): positives 11 (sim high) and 12 (sim lower →
    // hardest); negatives 20 (axis 1, sim ~0) and 21 (mixed vector closer
    // to the anchor → hardest negative)
    val corpus = Seq(
      (1L, near(0, 0.01f), 0),
      (11L, near(0, 0.02f), 0), (12L, near(0, 0.3f), 0),
      (20L, axis(1), 1),
      (21L, Seq(0.7f, 0.7f, 0f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val anchors = corpus.where(col("vec_id") === 1L)
    val out = KnnOps.tripletMine(anchors, corpus, "vec_id", "embedding",
      "label", margin = 0.1).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getInt(1) == 0)
    assert(r.getLong(2) == 12L, "hardest positive = lowest same-label sim")
    assert(r.getLong(4) == 21L, "hardest negative = highest other-label sim")
    val posSim = r.getDouble(3); val negSim = r.getDouble(5)
    // pos ≈ 0.895 (12 is a genuinely hard positive), neg ≈ 0.714
    assert(posSim > negSim && posSim > 0.85)
    // violated = 0.714 + 0.1 > 0.895 = false
    assert(!r.getBoolean(6))
  }

  test("tripletMine: anchors lacking a positive or negative are dropped") {
    val corpus = Seq(
      (1L, axis(0), 0),            // label 0 appears once → no positive
      (20L, axis(1), 1), (21L, near(1, 0.01f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = KnnOps.tripletMine(corpus, corpus, "vec_id", "embedding",
      "label", margin = 0.1)
    // anchor 1 has no positive; anchors 20/21 have no... they do have
    // positives (each other) and a negative (1) → exactly 2 rows
    assert(out.count() == 2)
    assert(out.where(col("vec_id") === 1L).count() == 0)
  }

  test("classification shapes: no window in centroidClassify's plan") {
    // the centroid path must stay pure-aggregate (scales to any corpus) —
    // a Window operator appearing would mean a per-row global sort crept in
    val train = Seq((10L, axis(0), 0), (20L, axis(1), 1))
      .toDF("vec_id", "embedding", "label")
    val test = Seq((1L, axis(0), 0)).toDF("vec_id", "embedding", "label")
    val plan = KnnOps.centroidClassify(test, train, "vec_id", "embedding",
      "label", dim = 4).queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"), s"unexpected Window in:\n$plan")
  }
}
