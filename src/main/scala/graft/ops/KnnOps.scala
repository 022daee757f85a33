package graft.ops

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Label-aware neighbor operations over an embedding corpus — the
  * classification and metric-learning faces of the ANN family in
  * [[Similarity]]: kNN majority-vote classification, nearest-centroid
  * (Rocchio) classification, and batch-hard triplet mining (Hermans et al.
  * 2017, arXiv:1703.07737 — per anchor, the least-similar same-label
  * positive and the most-similar other-label negative; the pairs a
  * contrastive fine-tune actually trains on).
  *
  * Scale shapes (the 100 TB posture differs per op):
  *  - kNN classify: anchor set broadcast, corpus scanned once; only the
  *    anchors×k survivor rows reach the vote aggregate.
  *  - centroid classify: per-label mean is ONE map-side-combinable
  *    aggregate over the whole corpus (dim bounded avg columns — no
  *    explode, no shuffle of vectors); prediction is then a broadcast
  *    argmax with no window at all.
  *  - triplet mine: one corpus scan, one aggregate keyed by the (small)
  *    anchor set — hardest pos/neg are min/max of (sim, id) structs, so
  *    ties break deterministically without a window sort.
  *
  * Reference analog: Key_Shared dispatch picks a consumer per key hash
  * (pulsar-broker/.../persistent/PersistentStickyKeyDispatcherMultipleConsumers.java);
  * these ops pick a LABEL per vector — same "route each record to its
  * nearest owner" contract, with cosine geometry instead of a hash ring.
  */
object KnnOps {

  /** kNN majority-vote classification of `test` against a labeled `train`
    * corpus: each test vector takes the modal label among its k most
    * cosine-similar train vectors (ties: higher vote count wins, then the
    * smaller label — deterministic, oracle-replayable). Returns
    * (vec_id, true_label, pred_label, correct). Test/train are disjoint
    * splits, so no self-pair drop is needed or performed. */
  def knnClassify(test: DataFrame, train: DataFrame, idCol: String,
                  vecCol: String, labelCol: String, k: Int): DataFrame = {
    val q = test.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      col(labelCol).as("true_label"))
    val c = Par.spread(train.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv"), col(labelCol).as("__nl")))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("sim", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    val votes = scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .groupBy(col("query_id"), col("true_label"), col("__nl"))
      .agg(count(lit(1)).as("votes"))
    // modal label, ties to the smallest: min_by over (-votes, label) — an
    // aggregate, not a second window, and the label is never negated so any
    // orderable label type (string, numeric) works
    votes.groupBy(col("query_id"), col("true_label"))
      .agg(min_by(col("__nl"),
        struct((-col("votes")).as("nv"), col("__nl").as("l"))).as("pred"))
      .select(col("query_id").as(idCol), col("true_label"),
        col("pred").as("pred_label"),
        (col("pred") === col("true_label")).as("correct"))
  }

  /** The IVF-blocked scale path of [[knnClassify]] — the kNN-JOIN shape
    * (every test row × huge train corpus) that survives 100 TB: train rows
    * are assigned their one nearest coarse cell in the scan, each test
    * vector probes its `nprobe` nearest cells, and the vote runs over
    * probed-cell candidates only. Probing every cell reproduces
    * [[knnClassify]] exactly (the candidate set is then complete);
    * at partial probe the neighbor candidates are a subset, so votes are
    * approximate — agreement with the exact vote is the quality claim the
    * board query emits. */
  def knnClassifyIvf(test: DataFrame, train: DataFrame, idCol: String,
                     vecCol: String, labelCol: String,
                     centroids: Array[Array[Double]], nprobe: Int,
                     k: Int): DataFrame = {
    val q = test.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        col(labelCol).as("true_label"))
      .withColumn("__cell",
        explode(KMeans.probeExpr(col("__qv"), centroids, nprobe)))
    val c = Par.spread(train.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("__cv"), col(labelCol).as("__nl")))
      .withColumn("__cell", KMeans.assignExpr(col("__cv"), centroids))
    val scored = c.join(broadcast(q), "__cell")
      .withColumn("sim", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    val votes = scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .groupBy(col("query_id"), col("true_label"), col("__nl"))
      .agg(count(lit(1)).as("votes"))
    votes.groupBy(col("query_id"), col("true_label"))
      .agg(min_by(col("__nl"),
        struct((-col("votes")).as("nv"), col("__nl").as("l"))).as("pred"))
      .select(col("query_id").as(idCol), col("true_label"),
        col("pred").as("pred_label"),
        (col("pred") === col("true_label")).as("correct"))
  }

  /** Nearest-centroid (Rocchio) classification: per-label mean vectors from
    * `train` (dim avg-aggregates in one corpus pass — map-side combined,
    * nothing exploded), then each test vector takes the label of its most
    * cosine-similar centroid (ties → smaller label). Returns
    * (vec_id, true_label, pred_label, correct). `dim` is the fixed
    * embedding width (the schema's contract, like [[Pq]] takes). */
  def centroidClassify(test: DataFrame, train: DataFrame, idCol: String,
                       vecCol: String, labelCol: String, dim: Int): DataFrame = {
    val cent = train.groupBy(col(labelCol).as("__cl"))
      .agg(array((1 to dim).map(i =>
        avg(element_at(col(vecCol), i))): _*).as("__cent"))
    val scored = test.select(col(idCol).as("query_id"),
        col(vecCol).as("__qv"), col(labelCol).as("true_label"))
      .crossJoin(broadcast(cent))
      .withColumn("sim", cosine(col("__qv"), col("__cent")))
    // argmax centroid per test row: min_by over (-sim, label), no window,
    // label-type-agnostic
    scored.groupBy(col("query_id"), col("true_label"))
      .agg(min_by(col("__cl"),
        struct((-col("sim")).as("ns"), col("__cl").as("l"))).as("pred"))
      .select(col("query_id").as(idCol), col("true_label"),
        col("pred").as("pred_label"),
        (col("pred") === col("true_label")).as("correct"))
  }

  /** The IVF-blocked scale path of [[tripletMine]]: positives keep their
    * natural complete block (the LABEL — every same-label candidate is
    * scanned, so the hardest positive is EXACT), while the negative side is
    * IVF-blocked like [[Similarity.ivfTopKProbed]]: the corpus is assigned
    * its one nearest cell in the same scan, each anchor probes its `nprobe`
    * nearest cells, and only probed-cell candidates are scored. The mined
    * negative is therefore approximate-but-dominated — its sim can never
    * exceed the exact hardest negative's (candidates are a subset), and
    * recall rises monotonically with nprobe. At mining scale (every anchor
    * × 100 TB corpus) this is the shape that survives: the all-pairs
    * cross join brute force needs does not. */
  def tripletMineIvf(anchors: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, labelCol: String,
                     centroids: Array[Array[Double]], nprobe: Int,
                     margin: Double, posCap: Int = Int.MaxValue): DataFrame = {
    // posCap = 1 could silently DROP an anchor: the one hash-sampled
    // member of its label block may be the anchor itself, which the
    // query_id =!= neighbor_id filter removes, leaving no positive — the
    // anchor then vanishes through the inner pos/neg join, contradicting
    // the anchor-completeness contract below. >= 2 guarantees a usable
    // member survives for every anchor in a nonempty block.
    require(posCap >= 2,
      s"posCap must be >= 2 for anchor-completeness (got $posCap): with " +
        "one sampled member per label block, an anchor whose block sample " +
        "is itself loses its positive and drops from the output")
    val qp = anchors.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      col(labelCol).as("__ql"))
    val cposAll = Par.spread(corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv"), col(labelCol).as("__ql")))
    // `posCap` bounds the positive side's label block to a deterministic
    // hash-ordered sample of ≤ posCap members per label (compiled to a
    // WindowGroupLimit — per-partition top-N, no global sort): the
    // positive join is anchors × their label block, and label blocks
    // grow linearly with the corpus, so the "complete block" exact
    // positive is O(n²/|labels|) at mining scale — the one part of this
    // miner cells cannot block (same-label members CONCENTRATE in the
    // anchor's own cells, so near-cell probing would only find easy
    // positives). The sampled hardest positive is dominance-safe in the
    // honest direction: a subset's min similarity is ≥ the full block's,
    // so `violated` can only under-fire, never invent a violation. A
    // nonempty block always keeps ≥ 1 sampled member (rank, not modulo).
    val cpos =
      if (posCap == Int.MaxValue) cposAll
      else {
        val w = Window.partitionBy(col("__ql"))
          .orderBy(xxhash64(col("neighbor_id")), col("neighbor_id"))
        cposAll.withColumn("__pr", row_number().over(w))
          .where(col("__pr") <= posCap).drop("__pr")
      }
    val pos = cpos.join(broadcast(qp), "__ql")
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("__qv"), col("__cv")))
      .groupBy(col("query_id"), col("__ql"))
      .agg(min(struct(col("sim"), col("neighbor_id").as("id"))).as("p"))
    val qn = anchors.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        col(labelCol).as("__ql"))
      .withColumn("__cell",
        explode(KMeans.probeExpr(col("__qv"), centroids, nprobe)))
    val cneg = Par.spread(corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("__cv"), col(labelCol).as("__cl")))
      .withColumn("__cell", KMeans.assignExpr(col("__cv"), centroids))
    val neg = cneg.join(broadcast(qn), "__cell")
      .where(col("__cl") =!= col("__ql"))
      .withColumn("sim", cosine(col("__qv"), col("__cv")))
      .groupBy(col("query_id"))
      // min over (−sim, id): highest sim, ties to the SMALLER id — the
      // numeric score is negated, never the id (any orderable id type)
      .agg(min(struct((-col("sim")).as("ns"),
        col("neighbor_id").as("id"), col("sim"))).as("n"))
    pos.join(neg, "query_id")
      .select(col("query_id").as(idCol), col("__ql").as("anchor_label"),
        col("p.id").as("pos_id"), round(col("p.sim"), 6).as("pos_sim"),
        col("n.id").as("neg_id"), round(col("n.sim"), 6).as("neg_sim"),
        (col("n.sim") + margin > col("p.sim")).as("violated"))
  }

  /** Batch-hard triplet mining: for each anchor, the HARDEST positive (the
    * same-label vector with the LOWEST cosine similarity — the one the
    * model must still pull in) and the HARDEST negative (the other-label
    * vector with the HIGHEST similarity — the one it must push out), plus
    * whether the pair violates `margin` (neg_sim + margin > pos_sim, the
    * triplets worth training on). Self-pairs are excluded. Sim ties break
    * to the smaller id. Returns (vec_id, anchor_label, pos_id, pos_sim,
    * neg_id, neg_sim, violated). One corpus scan, one aggregate. */
  def tripletMine(anchors: DataFrame, corpus: DataFrame, idCol: String,
                  vecCol: String, labelCol: String,
                  margin: Double): DataFrame = {
    val q = anchors.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      col(labelCol).as("__ql"))
    val c = Par.spread(corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv"), col(labelCol).as("__cl")))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("__qv"), col("__cv")))
    val same = col("__cl") === col("__ql")
    scored.groupBy(col("query_id"), col("__ql"))
      .agg(
        // hardest positive: min (sim, id) among same-label rows
        min(when(same, struct(col("sim"), col("neighbor_id").as("id"))))
          .as("p"),
        // hardest negative: min (−sim, id) — highest sim, ties to the
        // smaller id, without negating the id (any orderable id type)
        min(when(!same, struct((-col("sim")).as("ns"),
          col("neighbor_id").as("id"), col("sim"))))
          .as("n"))
      .where(col("p").isNotNull && col("n").isNotNull)
      .select(col("query_id").as(idCol), col("__ql").as("anchor_label"),
        col("p.id").as("pos_id"), round(col("p.sim"), 6).as("pos_sim"),
        col("n.id").as("neg_id"), round(col("n.sim"), 6).as("neg_sim"),
        (col("n.sim") + margin > col("p.sim")).as("violated"))
  }
}
