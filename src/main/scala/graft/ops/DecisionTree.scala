package graft.ops

import graft.functions.TextFunctions.{hash16, tokens}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Histogram-based decision-tree text classifier — the split-finding
  * shape every distributed GBDT uses (XGBoost/LightGBM approximate
  * histograms; Chen & Guestrin 2016): features are token COUNTS in
  * md5-hashed buckets, and each node's best split is found by ONE
  * aggregation over (bucket, threshold) candidate cells, scored by
  * training accuracy in exact integers.
  *
  * '''Determinism contract.''' A candidate cell's score is
  * `max(acc_ge→+1, acc_ge→−1)` — pure integer counts; the argmax is
  * total-ordered by (score desc, bucket asc, threshold asc), and the
  * ge-side label prefers +1 on ties. Candidates are the (bucket,
  * threshold ≤ maxThr) pairs ATTAINED by at least one document in the
  * node — the same sparse enumeration the oracle replays. Every driver
  * collect is one row (a split) or two numbers (node totals) — bounded
  * regardless of corpus size.
  *
  * '''Scale shape.''' Training a node = one map-side-combined histogram
  * aggregation over the node's feature rows (≤ buckets × maxThr output
  * cells) — the corpus is scanned once per LEVEL, not per candidate.
  * Prediction is a scan-stage expression over the ≤ 3 split buckets'
  * counts: no join, no shuffle.
  */
object DecisionTree {

  /** One internal node: split on `count(bucket) ≥ thr`; leaf labels for
    * the two sides (used when the side is a leaf). */
  final case class Split(bucket: Long, thr: Long, labGe: Long, labLt: Long)

  /** The full depth-2 model: the root split plus one split per side. */
  final case class Trained(root: Split, ge: Split, lt: Split)

  /** The trained tree served through the [[ModelGate]] contract — the
    * same broadcast-once / session-per-partition / batched plumbing as
    * the linear heads, so the cascade treats a tree classifier exactly
    * like a linear one. The feature vector is the DENSE bucket-count
    * array from [[denseFeatures]] (index b = token count in hash bucket
    * b); the score is the tree's ±1 verdict. */
  final case class TreeModel(t: Trained) extends ModelGate.Model {
    override def open(): ModelGate.Session = { batch =>
      batch.map { f =>
        def c(b: Long): Long =
          if (b >= 0 && b < f.length) f(b.toInt) else 0L
        val side = if (c(t.root.bucket) >= t.root.thr) t.ge else t.lt
        if (c(side.bucket) >= side.thr) side.labGe else side.labLt
      }
    }
  }

  /** Dense per-doc feature vectors for [[TreeModel]] serving: the sparse
    * hashed counts pivoted into a length-`buckets` array<bigint> at
    * `outCol` (docs with no tokens get all zeros, never null — a missing
    * vector would bypass the gate session). One id-keyed groupBy +
    * left join; `buckets` longs per row, corpus-linear. */
  def denseFeatures(docs: DataFrame, idCol: String, textCol: String,
                    buckets: Int, outCol: String): DataFrame = {
    val m = features(docs, idCol, textCol, buckets)
      .groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("b"), col("c"))))
        .as("__m"))
    docs.join(m, Seq(idCol), "left")
      .withColumn(outCol,
        transform(sequence(lit(0L), lit(buckets - 1L)),
          b => coalesce(element_at(col("__m"), b), lit(0L))))
      .drop("__m")
  }

  /** Sparse hashed features (id, b, c); docs with no tokens have no rows
    * (they fall to every split's lt side — count 0). */
  def features(docs: DataFrame, idCol: String, textCol: String,
               buckets: Int): DataFrame =
    docs.select(col(idCol), explode(tokens(col(textCol))).as("__t"))
      .where(col("__t") =!= "")
      .select(col(idCol),
        (hash16(col("__t")) % buckets).cast("long").as("b"))
      .groupBy(col(idCol), col("b")).agg(count(lit(1)).as("c"))

  /** Best attained split for the node `members` (id, y): one histogram
    * aggregation + a one-row collect. None when the node attains no
    * candidate (no feature rows). */
  private def bestSplit(f: DataFrame, members: DataFrame,
                        idCol: String, maxThr: Int): Option[Split] = {
    val tot = members.agg(
      coalesce(sum(when(col("y") === 1L, 1L).otherwise(0L)), lit(0L))
        .as("pos"),
      count(lit(1)).as("n")).collect()(0)
    val (totPos, totN) = (tot.getLong(0), tot.getLong(1))
    val totNeg = totN - totPos
    val cells = f.join(members, Seq(idCol))
      .select(col("b"),
        explode(sequence(lit(1L), least(col("c"), lit(maxThr.toLong))))
          .as("t"),
        col("y"))
      .groupBy(col("b"), col("t"))
      .agg(sum(when(col("y") === 1L, 1L).otherwise(0L)).as("pos_ge"),
        count(lit(1)).as("n_ge"))
      .select(col("b"), col("t"), col("pos_ge"),
        (col("n_ge") - col("pos_ge")).as("neg_ge"))
      .select(col("b"), col("t"),
        (col("pos_ge") + lit(totNeg) - col("neg_ge")).as("acc_pos"),
        (col("neg_ge") + lit(totPos) - col("pos_ge")).as("acc_neg"))
    val pick = cells
      .select(max_by(
        struct(col("b"), col("t"), col("acc_pos"), col("acc_neg")),
        struct(greatest(col("acc_pos"), col("acc_neg")).as("s"),
          (-col("b")).as("nb"), (-col("t")).as("nt"))).as("__p"))
      .collect()(0)
    Option(pick.getStruct(0)).map { r =>
      val (accP, accN) = (r.getLong(2), r.getLong(3))
      if (accP >= accN) Split(r.getLong(0), r.getLong(1), 1L, -1L)
      else Split(r.getLong(0), r.getLong(1), -1L, 1L)
    }
  }

  /** The node's majority label (+1 on ties) — the leaf fallback when no
    * split is attained. */
  private def majority(members: DataFrame): Long = {
    val t = members.agg(
      coalesce(sum(when(col("y") === 1L, 1L).otherwise(0L)), lit(0L))
        .as("pos"),
      count(lit(1)).as("n")).collect()(0)
    if (2L * t.getLong(0) >= t.getLong(1)) 1L else -1L
  }

  private def countOf(bucket: Long): Column =
    coalesce(sum(when(col("b") === bucket, col("c"))), lit(0L))

  /** The three split elections over an already-persisted feature table.
    * `y` must be persisted by the caller: every election action below
    * references it (7 evaluations of a text-derived label expression
    * otherwise — the label scan is the corpus pass, the histograms read
    * the persisted features). */
  private def trainOn(f: DataFrame, y: DataFrame, idCol: String,
                      maxThr: Int): Trained = {
    val root = bestSplit(f, y, idCol, maxThr)
      .getOrElse(Split(-1L, 1L, majority(y), majority(y)))
    // per-doc root-bucket count decides the side — persisted: the two
    // child elections evaluate their side twice each (totals + cells),
    // which re-ran this join + feature aggregation 4× when lazy
    val withRoot = y.join(
      f.groupBy(col(idCol)).agg(countOf(root.bucket).as("c_root")),
      Seq(idCol), "left")
      .na.fill(0L, Seq("c_root"))
      .persist()
    try {
      val geSide = withRoot.where(col("c_root") >= root.thr)
        .select(col(idCol), col("y"))
      val ltSide = withRoot.where(col("c_root") < root.thr)
        .select(col(idCol), col("y"))
      val geSplit = bestSplit(f, geSide, idCol, maxThr)
        .getOrElse(Split(-1L, Long.MaxValue, root.labGe, root.labGe))
      val ltSplit = bestSplit(f, ltSide, idCol, maxThr)
        .getOrElse(Split(-1L, Long.MaxValue, root.labLt, root.labLt))
      Trained(root, geSplit, ltSplit)
    } finally { withRoot.unpersist(); () }
  }

  /** Train the depth-2 tree and return the model — the training half of
    * [[trainPredict]], exposed so the tree can be persisted (a 3-row
    * artifact) and served through the [[ModelGate]] like any other head. */
  def train(docs: DataFrame, idCol: String, textCol: String,
            labelCol: Column, buckets: Int, maxThr: Int): Trained = {
    val f = features(docs, idCol, textCol, buckets).persist()
    val y = docs.select(col(idCol), labelCol.cast("long").as("y")).persist()
    try trainOn(f, y, idCol, maxThr)
    finally { f.unpersist(); y.unpersist(); () }
  }

  /** Train a depth-2 tree (root + one split per side) and score every
    * doc: (id, y, c_root, pred, correct). `labelCol` must be ±1. */
  def trainPredict(docs: DataFrame, idCol: String, textCol: String,
                   labelCol: Column, buckets: Int,
                   maxThr: Int): DataFrame = {
    val f = features(docs, idCol, textCol, buckets).persist()
    // persisted through training (the elections evaluate it ~7×: a
    // text-derived label re-scanned the corpus each time); unpersisted
    // before return like f — the final scoring action recomputes each
    // exactly once
    val y = docs.select(col(idCol), labelCol.cast("long").as("y")).persist()
    val t = trainOn(f, y, idCol, maxThr)
    val counts = f.groupBy(col(idCol)).agg(
      countOf(t.root.bucket).as("c_root"),
      countOf(t.ge.bucket).as("c_ge"),
      countOf(t.lt.bucket).as("c_lt"))
    f.unpersist(); y.unpersist()
    y.join(counts, Seq(idCol), "left")
      .na.fill(0L, Seq("c_root", "c_ge", "c_lt"))
      .withColumn("pred",
        when(col("c_root") >= t.root.thr,
          when(col("c_ge") >= t.ge.thr, t.ge.labGe)
            .otherwise(t.ge.labLt))
          .otherwise(
            when(col("c_lt") >= t.lt.thr, t.lt.labGe)
              .otherwise(t.lt.labLt)))
      .withColumn("correct", col("pred") === col("y"))
      .select(col(idCol), col("y"), col("c_root"), col("pred"),
        col("correct"))
  }
}
