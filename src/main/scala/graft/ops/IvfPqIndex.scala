package graft.ops

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF-PQ code store — the deployment face of [[Pq.ivfPqTopK]].
  *
  * Postings are (id, codes, cell) rows partitioned by coarse cell: ~4 B of
  * sub-quantizer codes stand in for ~256 B of floats, so the SCAN side of
  * a search reads the 64×-compressed representation and only the
  * per-query shortlist ever touches full vectors — fetched from the BASE
  * table by id, the IVFADC+R deployment reality (the index never stores a
  * float vector at all, which is the storage claim that matters when the
  * corpus is 100 TB). Search must return EXACTLY what the in-memory
  * composed layout ([[Pq.ivfPqTopK]]) returns for the same quantizers:
  * same probed cells, same ADC shortlist with the same (adc desc, id) tie
  * order, same exact-cosine re-rank.
  *
  * Store discipline shared with [[IvfIndex]]: generation directories under
  * a crash-safe pointer ([[GenStore]]), appends partitioned by cell (one
  * file per touched cell per batch), [[compact]] rewrites to one file per
  * cell. Single-driver append/compact serialization, like every other
  * persisted index here.
  *
  * Reference analog: tiered storage offloads ledger segments into a
  * compact columnar form read transparently on the scan path
  * (tiered-storage/.../impl/BlobStoreManagedLedgerOffloader.java); here
  * the "offloaded" form is the PQ code, and the hot path (re-rank) still
  * reads the authoritative full-precision rows. */
final class IvfPqIndex(spark: SparkSession, path: String, idCol: String,
                       vecCol: String, model: Pq.Model,
                       coarse: Array[Array[Double]]) {

  private val gens = new GenStore(path)

  private def appendGen(): File = gens.liveOrCreate()

  private def stored(): DataFrame =
    gens.currentGen().map(g => spark.read.parquet(g.getAbsolutePath))
      .getOrElse(throw new IllegalStateException(
        s"IVF-PQ index at $path has no postings yet (no add ran)"))

  /** Append one batch: vectors are coarse-assigned and PQ-encoded in the
    * same scan; only (id, codes, cell) is written — never the vector. */
  def add(batch: DataFrame): Unit = {
    val cell = KMeans.assignExpr(col(vecCol), coarse).cast("int")
    val guarded = when(cell.isNull, raise_error(
      lit("IvfPqIndex.add: null cell assignment — row would be unsearchable")))
      .otherwise(cell)
    batch.select(col(idCol),
        Pq.encodeExpr(col(vecCol), model).as("codes"),
        guarded.as("cell"))
      .repartition(col("cell"))
      .write.mode("append").partitionBy("cell")
      .parquet(appendGen().getAbsolutePath)
  }

  /** Rewrite to one file per cell in a fresh generation (atomic pointer
    * swap; the replaced generation stays readable for one cycle). */
  def compact(): Unit = gens.currentGen().foreach { cur =>
    val next = gens.newGenDir()
    spark.read.parquet(cur.getAbsolutePath)
      .dropDuplicates(idCol) // crashed-append replay guard
      .repartition(col("cell"))
      .write.partitionBy("cell").parquet(next.getAbsolutePath)
    gens.swapPointer(next.getName)
    gens.reapExcept(Set(next.getName, cur.getName))
  }

  /** IVFADC+R search over the stored codes: probed cells are collected
    * from the (tiny, broadcast) query set and pushed as a STATIC partition
    * filter, the ADC shortlist runs on code rows only, and the exact
    * re-rank fetches shortlist vectors from `full` (the base table) by id.
    * Row-identical to [[Pq.ivfPqTopK]] with the same quantizers. */
  def search(queries: DataFrame, full: DataFrame, nprobe: Int, k: Int,
             shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val probe = KMeans.probeExpr(col(vecCol), coarse, nprobe)
    // static pruning: the probed-cell set is bounded by queries × nprobe
    val probedCells = queries.select(explode(probe).as("__c"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val qp = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv"), explode(probe).as("__probe")))
    val cand = stored()
      .where(col("cell").isin(probedCells: _*))
      .select(col(idCol).as("neighbor_id"), col("codes"), col("cell"))
      .join(qp, col("cell") === col("__probe") &&
        col("neighbor_id") =!= col("query_id"))
      .withColumn("adc", Pq.adcScore(col("__qv"), col("codes"), model))
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("adc").desc, col("neighbor_id"))
    val short = cand.withColumn("__r", row_number().over(w1))
      .where(col("__r") <= shortlist)
      .select(col("query_id"), col("neighbor_id"), col("__qv"))
    val rescored = short
      .join(full.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("__cv")), Seq("neighbor_id"))
      .withColumn("sim",
        graft.functions.VectorFunctions.cosine(col("__qv"), col("__cv")))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    rescored.withColumn("__r2", row_number().over(w2)).where(col("__r2") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"))
  }
}
