package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lloyd's k-means over an embedding column — the coarse-quantizer trainer
  * that turns [[Similarity.ivfTopK]] into real IVF (train centroids, assign
  * cells, search only the probed cells).
  *
  * Spark-first shape: centroids live in the plan as literals (broadcast by
  * construction), assignment is k codegen'd dot products per row — ranking by
  * |c|² − 2·v·c, since |v|² is constant per row — and the mean recompute is
  * one hash aggregation per iteration over a CACHED projection (one parquet
  * read for the whole fit, not one per iteration). The only driver-side state
  * is the k×dim centroid matrix, which is what makes this run unchanged on a
  * 1000-executor corpus.
  */
object KMeans {

  /** k-means‖ initialization (Bahmani et al., VLDB 2012): a few passes that
    * oversample points with probability ∝ their squared distance to the
    * current center set, then a deterministic weighted farthest-first
    * reduction of the ~`2k·rounds` candidates to k on the driver. Unlike
    * first-k-by-id init this cannot collapse onto one dense region on
    * adversarial data. "Randomness" is xxhash64(id, round) — deterministic
    * across runs, engines and executors; no RNG state ships anywhere. */
  def initParallel(data: DataFrame, idCol: String, vecCol: String, k: Int,
                   rounds: Int = 2): Array[Array[Double]] = {
    def toVec(r: org.apache.spark.sql.Row): Array[Double] =
      r.getSeq[Any](0).map { // array<float> OR array<double>, like the dot expr
        case f: java.lang.Float => f.toDouble
        case d: java.lang.Double => d.doubleValue()
        case n: java.lang.Number => n.doubleValue()
      }.toArray
    val seed = data.orderBy(col(idCol)).limit(1).select(col(vecCol))
      .collect().map(toVec)
    val centers = ArrayBuffer(seed.toIndexedSeq: _*)
    val l = math.max(2 * k, 8) // oversampling factor per round

    (0 until rounds).foreach { round =>
      val d2 = minDistSq(col(vecCol), centers.toArray).as("__d2")
      val withD = data.select(col(idCol), col(vecCol), d2)
      val tot = withD.agg(sum(col("__d2"))).head().getDouble(0)
      if (tot > 0) {
        // uniform-in-[0,1) from the id hash; accept w.p. min(1, l·d²/Σd²)
        val r = pmod(xxhash64(col(idCol).cast("string"), lit(round)),
          lit(1000000L)).cast("double") / 1000000.0
        val picked = withD
          .where(r < least(lit(1.0), col("__d2") * l / tot))
          .select(col(vecCol)).collect().map(toVec)
        centers ++= picked
      }
    }

    // weight candidates by the number of points they serve, then reduce to k
    // by deterministic weighted farthest-first (heaviest seed; then argmax of
    // weight × distance² to the chosen set)
    val cands = centers.toArray
    if (cands.length <= k) return cands
    val weights = data
      .select(assignExpr(col(vecCol), cands).as("c"))
      .groupBy(col("c")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val chosen = ArrayBuffer(
      weights.toSeq.sortBy { case (i, w) => (-w, i) }.head._1)
    while (chosen.length < k) {
      val next = cands.indices
        .filterNot(chosen.contains)
        .maxBy(i => (weights.getOrElse(i, 0L).toDouble max 1.0) *
          chosen.map(j => d2(cands(i), cands(j))).min)
      chosen += next
    }
    chosen.map(cands).toArray
  }

  /** Min squared L2 distance from `vec` to any of `centers` (|v|² included —
    * needed for the absolute d² the ‖-init sampling uses). Fused
    * ([[graft.functions.KMeansMinDistSq]]): the old per-center
    * nested-least fold was O(|centers|) column nodes, and the ‖-init's
    * oversampled candidate set (~2k per round) overflowed the driver
    * stack during column conversion once √n quantizers passed ~150
    * cells; identical values. */
  private def minDistSq(vec: Column, centers: Array[Array[Double]]): Column = {
    val k = centers.length
    val dim = centers(0).length
    val flat = new Array[Double](k * dim)
    centers.zipWithIndex.foreach { case (c, i) =>
      System.arraycopy(c, 0, flat, i * dim, dim)
    }
    val c2 = centers.map(c => c.map(x => x * x).sum)
    graft.functions.GraftExpressions.kmeans_min_dist_sq(vec, flat, c2, k, dim)
  }

  /** Train centroids: k-means‖ init + `iters` Lloyd iterations over one
    * cached pass-through projection. */
  /** Deterministic bounded training sample. Quantizer training needs a
    * REPRESENTATIVE sample, not the corpus — the FAISS working point is a
    * few hundred vectors per centroid — so cap the training set by
    * md5-hash Bernoulli selection: replay-stable, partition-independent
    * (no `sample()` RNG), and at 100 TB the Lloyd iterations touch
    * megabytes instead of re-scanning the corpus per iteration. Corpora at
    * or under the cap train on everything (exact no-op, so small-scale
    * results are byte-identical with or without this guard). */
  private[ops] def trainSample(df: DataFrame, key: Column,
                               maxRows: Long): DataFrame = {
    val n = df.count()
    if (n <= maxRows) df
    else Sampling.hashFraction(df, key, maxRows.toDouble / n)
  }

  /** 256 training vectors per centroid, floored at 4096 — under any
    * verify-scale corpus, dominant at cluster scale. */
  private[ops] def trainCap(k: Int): Long = math.max(4096L, 256L * k)

  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int)
  : Array[Array[Double]] = {
    val data = Par.spread(trainSample(df.select(col(idCol), col(vecCol)),
      col(idCol), trainCap(k))).persist()
    try {
      val dim = data.select(size(col(vecCol))).head().getInt(0)
      var centroids = initParallel(data, idCol, vecCol, k)
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
    } finally { data.unpersist(); () }
  }

  /** Cell assignment as a pure Column: argmin over centroids of
    * |c|² − 2·v·c (row-constant |v|² dropped). One fused native expression
    * ([[graft.functions.KMeansAssignArgmin]]) — the k-struct array_min tree
    * it replaces collapses to ~ms/row interpreted evaluation in any stage
    * without whole-stage codegen (every ANN scoring stage behind a
    * broadcast nested-loop join); bit-identical results. */
  def assignExpr(vec: Column, centroids: Array[Array[Double]]): Column = {
    val k = centroids.length
    val dim = centroids(0).length
    val flat = new Array[Double](k * dim)
    centroids.zipWithIndex.foreach { case (c, i) =>
      System.arraycopy(c, 0, flat, i * dim, dim)
    }
    val c2 = centroids.map(c => c.map(x => x * x).sum)
    graft.functions.GraftExpressions.kmeans_assign(vec, flat, c2, k, dim)
  }

  /** Multi-probe list: indices of the `nprobe` nearest centroids, nearest
    * first. Real IVF probes several cells — single-probe recall falls off a
    * cliff for queries near cell boundaries (the verdict's nprobe=1 gap).
    * Fused ([[graft.functions.KMeansProbeList]]) like [[assignExpr]]: the
    * old k-struct + sort_array tree was O(k) column nodes and overflowed
    * the driver stack just being CONVERTED once √n cell counts passed
    * ~150 (the sf9 rag corpus sizes to ~200 cells); output is
    * bit-identical. */
  def probeExpr(vec: Column, centroids: Array[Array[Double]],
                nprobe: Int): Column = {
    val k = centroids.length
    val dim = centroids(0).length
    val flat = new Array[Double](k * dim)
    centroids.zipWithIndex.foreach { case (c, i) =>
      System.arraycopy(c, 0, flat, i * dim, dim)
    }
    val c2 = centroids.map(c => c.map(x => x * x).sum)
    graft.functions.GraftExpressions.kmeans_probe_list(
      vec, flat, c2, k, dim, nprobe)
  }

  /** Train + assign: returns the input with a `cell` column — feed straight
    * into [[Similarity.ivfTopK]] with cellCol = "cell". */
  def ivfIndex(df: DataFrame, idCol: String, vecCol: String, k: Int,
               iters: Int = 5): DataFrame =
    df.withColumn("cell", assignExpr(col(vecCol), fit(df, idCol, vecCol, k, iters)))

  /** Persist a trained coarse quantizer next to its table: one tiny parquet
    * of (cell, centroid) rows — k×dim doubles, readable by any engine. The
    * reference analog is index state outliving a run (a quantizer is a
    * reusable artifact, like the in-process [[graft.queries.VectorQueries]]
    * centroid cache but durable). */
  def saveCentroids(spark: org.apache.spark.sql.SparkSession, path: String,
                    centroids: Array[Array[Double]]): Unit = {
    import spark.implicits._
    centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a quantizer persisted by [[saveCentroids]], cells in order. */
  def loadCentroids(spark: org.apache.spark.sql.SparkSession,
                    path: String): Array[Array[Double]] = {
    import spark.implicits._
    spark.read.parquet(path)
      .select(col("cell").cast("int"), col("centroid"))
      .as[(Int, Seq[Double])].collect()
      .sortBy(_._1).map(_._2.toArray)
  }

  /** Load the quantizer at `path` if present, else train one and persist
    * it there — the deploy shape: first run trains, every later run (and
    * every other consumer of the table) reuses the artifact. */
  def fitOrLoad(df: DataFrame, idCol: String, vecCol: String, k: Int,
                iters: Int, path: String): Array[Array[Double]] = {
    val spark = df.sparkSession
    // a COMPLETE artifact carries the writer's _SUCCESS marker; a directory
    // without one is a crashed save — retrain over it rather than wedging
    // every later run on a partial read
    if (new java.io.File(path, "_SUCCESS").exists()) loadCentroids(spark, path)
    else {
      val cents = fit(df, idCol, vecCol, k, iters)
      saveCentroids(spark, path, cents)
      cents
    }
  }
}
