package graft.ops

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze, Schmid 2011, "Product Quantization
  * for Nearest Neighbor Search", public IEEE TPAMI) — the compression layer
  * that makes billion-vector ANN fit in memory: split each d-dim vector
  * into `m` subvectors, k-means each subspace independently, and store only
  * the m centroid ids (m·log₂k bits, e.g. 64 floats → 8 nibbles) — with
  * asymmetric-distance (ADC) search that scores FULL-precision queries
  * against compressed corpus codes via per-subspace lookup sums.
  *
  * Reference analog: tiered storage keeps cold data in a compact offloaded
  * form and serves reads through a cheaper representation
  * (tiered-storage-jcloud offload + read-back); PQ is the vector-search
  * instance — the corpus lives compressed, queries stay exact.
  *
  * Scale shape: training runs m small k-means fits (each over a
  * subspace-sliced projection); encoding is a pure column expression (no
  * shuffle — it lands in the scan stage); ADC search broadcasts the
  * (tiny) query side and streams the code table once, the same join shape
  * as [[Similarity.ivfTopK]]. Composes with [[IvfIndex]]: coarse cells
  * prune the scan, PQ shrinks what remains — the standard IVF-PQ layout.
  */
object Pq {

  /** m per-subspace codebooks, each k × subDim. */
  final case class Model(m: Int, subDim: Int,
                         codebooks: Array[Array[Array[Double]]]) {
    require(codebooks.length == m)
  }

  private def sub(vec: Column, mi: Int, subDim: Int): Column =
    slice(vec, mi * subDim + 1, subDim)

  /** Train all m sub-quantizers JOINTLY: one exploded (subspace,
    * subvector) frame, deterministic hash-order seeding, and one
    * distributed aggregation per Lloyd iteration covering every subspace
    * at once — m separate [[KMeans.fit]] calls would pay m× the job-count
    * overhead (init rounds + per-iteration collects) for identical math.
    * Deterministic: seeds are the first k distinct subvectors per
    * subspace in (xxhash64, value) order. */
  def train(df: DataFrame, idCol: String, vecCol: String, m: Int, k: Int,
            iters: Int): Model = {
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    // codebooks train on a bounded deterministic sample (see
    // KMeans.trainSample) — encode/search always run over the full corpus
    val train = KMeans.trainSample(df, col(idCol), KMeans.trainCap(k))
    val sliced = Par.spread(train.select(explode(array((0 until m).map(mi =>
        struct(lit(mi).as("mi"), sub(col(vecCol), mi, subDim).as("sv"))): _*))
      .as("x"))
      .select(col("x.mi").as("mi"), col("x.sv").as("sv"))).persist()
    try {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("mi"))
        .orderBy(xxhash64(col("sv")), col("sv").cast("string"))
      val seedRows = sliced.distinct()
        .withColumn("__r", row_number().over(w))
        .where(col("__r") <= k)
        .select(col("mi"), col("__r"), col("sv"))
        .collect()
      val seedsBy = seedRows.groupBy(_.getInt(0)).map { case (mi, rs) =>
        mi -> rs.sortBy(_.getInt(1)).map(
          _.getSeq[Float](2).map(_.toDouble).toArray)
      }
      var books: Array[Array[Array[Double]]] = (0 until m).map { mi =>
        val s = seedsBy.getOrElse(mi, Array.empty[Array[Double]])
        require(s.nonEmpty, s"subspace $mi has no vectors to seed from")
        // fewer than k distinct subvectors: cycle (duplicate centroids are
        // harmless — argmin picks the lowest index, extras sit empty)
        Array.tabulate(k)(i => s(i % s.length))
      }.toArray
      (0 until iters).foreach { _ =>
        val cell = (0 until m).foldLeft(lit(-1)) { (acc, mi) =>
          when(col("mi") === mi, KMeans.assignExpr(col("sv"), books(mi)))
            .otherwise(acc)
        }
        val meanCols = (1 to subDim).map(i =>
          avg(element_at(col("sv"), i).cast("double")).as(s"m$i"))
        val means = sliced.withColumn("cell", cell)
          .groupBy(col("mi"), col("cell"))
          .agg(meanCols.head, meanCols.tail: _*)
          .collect()
          .map(r => (r.getInt(0), r.getInt(1)) ->
            (1 to subDim).map(i => r.getDouble(1 + i)).toArray).toMap
        books = Array.tabulate(m)(mi => Array.tabulate(k)(c =>
          means.getOrElse((mi, c), books(mi)(c))))
      }
      Model(m, subDim, books)
    } finally { sliced.unpersist(); () }
  }

  /** The m-code array of a vector — nearest sub-centroid per subspace, a
    * pure scalar expression evaluated in the scan stage. Fused into one
    * native expression ([[graft.functions.PqEncode]]) for the same reason
    * as [[adcScore]]: the encode lands in codegen-less join stages where a
    * compositional m×k tree runs interpreted at ~ms/row. */
  def encodeExpr(vec: Column, model: Model): Column = {
    val k = model.codebooks(0).length
    val flat = new Array[Double](model.m * k * model.subDim)
    val c2 = new Array[Double](model.m * k)
    var mi = 0
    while (mi < model.m) {
      var c = 0
      while (c < k) {
        System.arraycopy(model.codebooks(mi)(c), 0, flat,
          (mi * k + c) * model.subDim, model.subDim)
        c2(mi * k + c) = model.codebooks(mi)(c).map(x => x * x).sum
        c += 1
      }
      mi += 1
    }
    graft.functions.GraftExpressions.pq_encode(
      vec, flat, c2, model.m, k, model.subDim)
  }

  /** Asymmetric inner-product score: IP(q, x) ≈ Σₘ IP(qₘ, c_{m,codeₘ}).
    * One fused native expression ([[graft.functions.PqAdcScore]]): the
    * ADC scan sits behind a broadcast join with no whole-stage codegen,
    * where a compositional slice+lookup+dot tree falls back to interpreted
    * per-row evaluation (~100× slower); the fused loop is fast in BOTH
    * modes and carries the codebooks as one flattened reference array,
    * never per-row literals. Bit-identical to the compositional form. */
  def adcScore(qvec: Column, codes: Column, model: Model): Column = {
    val k = model.codebooks(0).length
    val flat = new Array[Double](model.m * k * model.subDim)
    var mi = 0
    while (mi < model.m) {
      var c = 0
      while (c < k) {
        System.arraycopy(model.codebooks(mi)(c), 0, flat,
          (mi * k + c) * model.subDim, model.subDim)
        c += 1
      }
      mi += 1
    }
    graft.functions.GraftExpressions.pq_adc_score(
      qvec, codes, flat, model.m, k, model.subDim)
  }

  /** Top-k by ADC score for each query row against a compressed corpus
    * (`codesDf`: idCol + `codes`). Queries broadcast; the code table is
    * streamed once. Ties break by neighbor id. */
  def adcTopK(queries: DataFrame, codesDf: DataFrame, idCol: String,
              vecCol: String, model: Model, k: Int,
              dropSelf: Boolean = true): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv")))
    val scored = codesDf.select(col(idCol).as("neighbor_id"), col("codes"))
      .crossJoin(q)
      .where(if (dropSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .withColumn("adc", adcScore(col("__qv"), col("codes"), model))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("neighbor_id"))
    scored.withColumn("__r", row_number().over(w))
      .where(col("__r") <= k)
      .select(col("query_id"), col("neighbor_id"), col("adc"))
  }

  /** The full IVF-PQ layout (coarse cells prune the scan, PQ codes score
    * what remains, exact re-rank restores precision): each query probes
    * its `nprobe` nearest coarse cells, ADC-scores ONLY those cells' code
    * rows, shortlists `shortlist` candidates, and re-ranks them with the
    * exact dot. `indexed` must carry `cell` ([[KMeans.assignExpr]]),
    * `codes` ([[encodeExpr]]) and the full vector (for the re-rank
    * lookup). At 100 TB the cell filter is a partition prune
    * ([[IvfIndex]]'s cell-dir layout), the codes are the only thing the
    * scan decodes, and full vectors are fetched for shortlist rows only. */
  def ivfPqTopK(queries: DataFrame, indexed: DataFrame, idCol: String,
                vecCol: String, coarse: Array[Array[Double]], model: Model,
                k: Int, nprobe: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val qp = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv"),
      explode(KMeans.probeExpr(col(vecCol), coarse, nprobe)).as("__probe")))
    val cand = indexed
      .select(col(idCol).as("neighbor_id"), col("codes"), col("cell"),
        col(vecCol).as("__cv"))
      .join(qp, col("cell") === col("__probe") &&
        col("neighbor_id") =!= col("query_id"))
      .withColumn("adc", adcScore(col("__qv"), col("codes"), model))
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("adc").desc, col("neighbor_id"))
    val short = cand.withColumn("__r", row_number().over(w1))
      .where(col("__r") <= shortlist)
      .withColumn("sim", VectorFunctions.cosine(col("__qv"), col("__cv")))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    short.withColumn("__r2", row_number().over(w2)).where(col("__r2") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"))
  }

  /** ADC shortlist + exact re-rank (the production IVFADC+R shape): the
    * compressed scan nominates `shortlist` candidates per query, then ONLY
    * those rows' full vectors are fetched (a semi-join-sized lookup, not a
    * corpus scan) and re-scored with the exact codegen'd dot. Compression
    * does the heavy lifting; precision comes back on a per-query constant.
    * Ties break by neighbor id at both stages. */
  def adcTopKRerank(queries: DataFrame, codesDf: DataFrame, full: DataFrame,
                    idCol: String, vecCol: String, model: Model, k: Int,
                    shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val cand = adcTopK(queries, codesDf, idCol, vecCol, model, shortlist)
      .select(col("query_id"), col("neighbor_id"))
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv")))
    val rescored = cand
      .join(full.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("__cv")), Seq("neighbor_id"))
      .join(q, Seq("query_id"))
      .withColumn("sim", VectorFunctions.cosine(col("__qv"), col("__cv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    rescored.withColumn("__r", row_number().over(w))
      .where(col("__r") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"))
  }

  /** Persist a trained model as (mi, ci, v) parquet — the codebook twin of
    * [[KMeans.saveCentroids]], so a persisted index can bind its quantizers
    * to the generation whose postings they encoded. */
  /** The model as (mi, ci, v) rows — the persisted representation. */
  def modelRows(spark: org.apache.spark.sql.SparkSession,
                model: Model): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val rows = for {
      mi <- 0 until model.m
      ci <- model.codebooks(mi).indices
    } yield (mi, ci, model.codebooks(mi)(ci).toSeq)
    rows.toDF("mi", "ci", "v").coalesce(1)
  }

  /** Rebuild a model from (mi, ci, v) rows (parquet doubles round-trip
    * exactly, so the rebuilt model encodes bit-identically). */
  def modelOfRows(rows: Array[(Int, Int, Seq[Double])]): Model = {
    require(rows.nonEmpty, "no PQ model rows")
    val m = rows.map(_._1).max + 1
    val cbs = Array.tabulate(m)(mi =>
      rows.filter(_._1 == mi).sortBy(_._2).map(_._3.toArray))
    Model(m, cbs(0)(0).length, cbs)
  }

  def saveModel(spark: org.apache.spark.sql.SparkSession, path: String,
                model: Model): Unit =
    modelRows(spark, model).write.mode("overwrite").parquet(path)

  /** Load a model persisted by [[saveModel]] — parquet doubles round-trip
    * exactly, so encode/ADC under the loaded model are bit-identical to
    * the original. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
                path: String): Model = {
    import spark.implicits._
    modelOfRows(spark.read.parquet(path)
      .select(col("mi").cast("int"), col("ci").cast("int"), col("v"))
      .as[(Int, Int, Seq[Double])].collect())
  }
}
