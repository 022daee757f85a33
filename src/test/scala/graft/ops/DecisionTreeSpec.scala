package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[DecisionTree]] — histogram-split depth-2 classifier. */
class DecisionTreeSpec extends SparkSuite {
  import spark.implicits._

  // an OR of two count rules no single stump can express: +1 iff
  // "alpha" appears ≥2 times or "beta" appears ≥3 times
  private def corpus = Seq(
    (1L, "alpha alpha filler words here"),
    (2L, "alpha alpha alpha other filler"),
    (3L, "beta beta beta filler filler"),
    (4L, "beta beta beta beta filler"),
    (5L, "alpha beta filler words here"),
    (6L, "filler words only in this one"),
    (7L, "beta beta filler words here"),
    (8L, "alpha filler words here too"))
    .toDF("doc_id", "text")

  private def label = {
    val toks = filter(split(col("text"), " "), t => t =!= "")
    when(size(filter(toks, t => t === "alpha")) >= 2 ||
      size(filter(toks, t => t === "beta")) >= 3, 1L).otherwise(-1L)
  }

  test("depth-2 learns an OR of two count rules exactly") {
    val out = DecisionTree.trainPredict(corpus, "doc_id", "text", label,
        buckets = 64, maxThr = 3)
      .select("doc_id", "y", "pred", "correct")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(out.forall(_._4),
      s"tree must fit the planted rule; got ${out.mkString(",")}")
    assert(out.count(_._2 == 1L) == 4, "four positives planted")
  }

  test("training is deterministic across partitionings") {
    def run(parts: Int) = DecisionTree.trainPredict(
        corpus.repartition(parts), "doc_id", "text", label, 64, 3)
      .orderBy("doc_id").collect().toSeq
    assert(run(1) == run(5),
      "integer histogram argmax must not depend on partitioning")
  }

  test("docs with no tokens fall to the lt side and still get a verdict") {
    val withEmpty = corpus.unionByName(
      Seq((9L, "")).toDF("doc_id", "text"))
    val out = DecisionTree.trainPredict(withEmpty, "doc_id", "text", label,
        buckets = 64, maxThr = 3)
      .where($"doc_id" === 9L)
      .select("y", "pred").as[(Long, Long)].collect()
    assert(out.length == 1 && out.head._1 == -1L && out.head._2 == -1L)
  }

  test("degenerate node (no feature rows) falls back to the majority leaf") {
    val tiny = Seq((1L, ""), (2L, ""), (3L, "")).toDF("doc_id", "text")
    val out = DecisionTree.trainPredict(tiny, "doc_id", "text",
        when(col("doc_id") === 1L, 1L).otherwise(-1L), 64, 3)
      .select("pred").as[Long].collect().toSeq
    assert(out == Seq(-1L, -1L, -1L), "majority label −1 everywhere")
  }

  test("gate-served tree matches trainPredict's verdict for every doc") {
    // the ModelGate serving path (dense bucket-count features + the
    // broadcast TreeModel session) must agree with the in-plan predict
    // expression doc for doc
    val t = DecisionTree.train(corpus, "doc_id", "text", label,
      buckets = 64, maxThr = 3)
    val viaGate = ModelGate.withScores(
        DecisionTree.denseFeatures(corpus, "doc_id", "text", 64, "__f"),
        "__f", "score", DecisionTree.TreeModel(t))
      .select(col("doc_id"), col("score"))
    val direct = DecisionTree.trainPredict(corpus, "doc_id", "text", label,
        buckets = 64, maxThr = 3)
      .select(col("doc_id"), col("pred"))
    val joined = viaGate.join(direct, "doc_id").collect()
    assert(joined.length == 8 &&
      joined.forall(r => r.getLong(1) == r.getLong(2)),
      s"gate and plan verdicts must agree: ${joined.mkString(",")}")
  }

  test("dense features: a tokenless doc gets all zeros, never null") {
    val withEmpty = corpus.unionByName(Seq((9L, "")).toDF("doc_id", "text"))
    val f = DecisionTree
      .denseFeatures(withEmpty, "doc_id", "text", 64, "__f")
      .where($"doc_id" === 9L).select($"__f").as[Seq[Long]].collect()
    assert(f.length == 1 && f.head.length == 64 && f.head.forall(_ == 0L),
      "a null vector would bypass the gate session")
  }
}
