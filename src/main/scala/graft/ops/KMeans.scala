package graft.ops

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lloyd's k-means over an embedding column — the coarse-quantizer trainer
  * that turns [[Similarity.ivfTopK]] into real IVF (train centroids, assign
  * cells, search only the probed cell).
  *
  * Spark-first shape: centroids live in the plan as literals (broadcast by
  * construction), assignment is k codegen'd dot products per row — ranking by
  * |c|² − 2·v·c, since |v|² is constant per row — and the mean recompute is
  * one hash aggregation per iteration. The only driver-side state is the
  * k×dim centroid matrix, which is what makes this run unchanged on a
  * 1000-executor corpus.
  */
object KMeans {

  /** Deterministic init: the first k vectors in id order (reproducible across
    * runs and engines; k-means|| would go here for adversarial inits). */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int)
  : Array[Array[Double]] = {
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    var centroids: Array[Array[Double]] = df
      .orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)

    val data = Par.spread(df.select(col(vecCol)))
    (0 until iters).foreach { _ =>
      val assigned = data.withColumn("cell", assignExpr(col(vecCol), centroids))
      val meanCols = (1 to dim).map(i =>
        avg(element_at(col(vecCol), i).cast("double")).as(s"m$i"))
      val means = assigned.groupBy(col("cell"))
        .agg(meanCols.head, meanCols.tail: _*)
        .collect()
        .map(r => r.getInt(0) -> (1 to dim).map(i =>
          r.getDouble(i)).toArray).toMap
      centroids = centroids.indices.map(c =>
        means.getOrElse(c, centroids(c))).toArray // empty cell keeps centroid
    }
    centroids
  }

  /** Cell assignment as a pure Column: argmin over centroids of
    * |c|² − 2·v·c (row-constant |v|² dropped). */
  def assignExpr(vec: Column, centroids: Array[Array[Double]]): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      val c2 = c.map(x => x * x).sum
      struct(
        (lit(c2) - lit(2.0) * VectorFunctions.dot(vec, typedlit(c.toSeq)))
          .as("d"),
        lit(i).as("i"))
    }
    array_min(array(scored.toIndexedSeq: _*)).getField("i")
  }

  /** Train + assign: returns the input with a `cell` column — feed straight
    * into [[Similarity.ivfTopK]] with cellCol = "cell". */
  def ivfIndex(df: DataFrame, idCol: String, vecCol: String, k: Int,
               iters: Int = 5): DataFrame =
    df.withColumn("cell", assignExpr(col(vecCol), fit(df, idCol, vecCol, k, iters)))
}
