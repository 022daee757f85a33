package graft.ops

import java.io.File

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF postings for continuous-ingest ANN — the vector twin of
  * [[MinHashIndex]]: a pipeline that embeds documents batch by batch
  * appends each batch's vectors into their coarse cells and searches
  * against the accumulated index, never re-scanning (let alone
  * re-shuffling) the whole corpus per query batch.
  *
  * Layout: one generation directory ([[GenStore]] pointer contract) holding
  * parquet partitioned by `cell=` — [[add]] appends one file per TOUCHED
  * cell per batch (repartitioned on the partition column first, so a wide
  * batch cannot explode into tasks×cells tiny files), and [[search]] prunes
  * the scan to the probed cells with a static partition filter collected on
  * the driver (bounded by |queries| × nprobe — the query side is broadcast
  * anyway). A periodic [[compact]] rewrites accumulated per-batch files to
  * one per cell, the same maintenance cadence as the other stores.
  *
  * Cell assignment is the caller's expression — `label`-style precomputed
  * cells for oracle-exact tests, [[KMeans.assignExpr]] against trained
  * centroids for real use (probe with [[KMeans.probeExpr]]); the index
  * stores whatever cell ids it is given.
  *
  * Crash contract: a replayed append re-lands the same (id, vector, cell)
  * rows; [[search]] de-duplicates postings by id, so replay never changes
  * results. Appends/compacts are serialized by a single driver.
  *
  * Reference analog: tiered index state that outlives any run — offloaded
  * ledger indexes (`tiered-storage/.../OffloadIndexBlockImpl.java`).
  */
class IvfIndex(spark: SparkSession, path: String, idCol: String,
               vecCol: String) {

  private val gens = new GenStore(path)

  private def appendGen(): File = gens.liveOrCreate()

  private def postings(): Option[DataFrame] =
    gens.readLive(spark,
      f => f.isDirectory && f.getName.startsWith("cell="))

  /** Append one batch: each vector lands in the cell `cell` evaluates to.
    * One file per touched cell. A null cell fails the write loudly — Hive
    * partitioning would otherwise bury the row in the default partition
    * where search's cell filter can never find it (silent data loss). */
  def add(batch: DataFrame, cell: Column): Unit = {
    val c = cell.cast("int")
    val guarded = when(c.isNull, raise_error(
      lit("IvfIndex.add: null cell assignment — row would be unsearchable")))
      .otherwise(c)
    batch.select(col(idCol), col(vecCol), guarded.as("cell"))
      .repartition(col("cell"))
      .write.mode("append").partitionBy("cell")
      .parquet(appendGen().getAbsolutePath)
  }

  /** Top-k cosine neighbors from the probed cells only. `queries` must be
    * small (it is broadcast); `probeCells` is an array column of cell ids
    * to search (a one-element array = classic single-probe IVF,
    * [[KMeans.probeExpr]] = multi-probe). Returns (query_id, neighbor_id,
    * sim, rank). */
  def search(queries: DataFrame, probeCells: Column, k: Int): DataFrame = {
    val stored = postings().getOrElse(throw new IllegalStateException(
      s"IVF index at $path has no postings yet (no add ran)"))
    val q = queries.select(col(idCol).as("query_id"),
        col(vecCol).as("__qv"), probeCells.as("__cells"))
      // explode_OUTER: a null/empty probe array must surface as a null cell
      // for the loud check below — plain explode would silently drop the
      // query from the results, indistinguishable from "no neighbors"
      .withColumn("__cell", explode_outer(col("__cells")))
      .withColumn("__cell", col("__cell").cast("int"))
      .drop("__cells")
      // queries feed two consumers (the probe-cell collect and the scoring
      // join) and are small by contract — materialize the plan once
      .localCheckpoint(true)
    // static partition filter from the driver-collected probe set: the scan
    // lists and reads ONLY the probed cell directories. Null, empty, or
    // null-element probe arrays fail here, loudly — isin(null) can never
    // match a stored row.
    val cells = q.select("__cell").distinct().collect().map { r =>
      require(!r.isNullAt(0),
        "IvfIndex.search: null or empty probe-cell array")
      r.getInt(0)
    }.toSeq
    val c = stored.where(col("cell").isin(cells: _*))
      // a crash-replayed append re-lands identical rows — id wins once
      .dropDuplicates(idCol)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
        col("cell").as("__cell"))
    Similarity.topK(
      Similarity.scoreAgainst(Par.spread(c), q, "__cell"),
      k, Seq("query_id"))
  }

  /** The index's own quantizer, trained once and persisted BESIDE the
    * postings (`_centroids/` under the index path): the first call trains
    * on `train` and saves; every later call — including a restarted
    * pipeline, or another consumer opening the same path — loads the saved
    * artifact. This is the restart-safety contract: postings were written
    * under these centroids' cell assignment, so re-fitting on restart
    * (slightly different centroids → different cells) would silently probe
    * cells that do not match the stored layout. Always assign adds with
    * [[KMeans.assignExpr]] and probe with [[KMeans.probeExpr]] over THIS
    * array. */
  def centroids(train: DataFrame, k: Int, iters: Int): Array[Array[Double]] = {
    val artifact = new File(path, "_centroids")
    if (new File(artifact, "_SUCCESS").exists()) {
      val cents = KMeans.loadCentroids(spark, artifact.getAbsolutePath)
      // the persisted artifact wins over the arguments — but silently
      // returning a different-k quantizer breaks callers sized to k. The
      // postings were laid out under THIS artifact, so the remedy is to
      // match it, never to delete it (that would strand the postings).
      require(cents.length == k,
        s"persisted quantizer at $artifact has ${cents.length} cells but " +
          s"caller asked for $k — pass k=${cents.length} (the layout the " +
          "postings were written under), or rebuild the index to change k")
      cents
    } else {
      // refuse to FIRST-train over existing postings: they were written
      // under some other cell layout (caller-provided cells, or a lost
      // artifact) and a fresh quantizer would silently probe cells the
      // postings were not laid out under. Listing-only check — no reason
      // to pay a parquet schema-inference job for an existence question.
      if (gens.hasData(f => f.isDirectory && f.getName.startsWith("cell=")))
        throw new IllegalStateException(
          s"IVF index at $path has postings but no persisted quantizer — " +
            "training one now would not match the stored cell layout")
      val cents = KMeans.fit(train, idCol, vecCol, k, iters)
      // validate BEFORE persisting: a tiny training frame can yield < k
      // centroids, and persisting that artifact first would wedge every
      // retry behind a misleading "stale artifact" error
      require(cents.length == k,
        s"training produced ${cents.length} < $k centroids — too few " +
          "distinct vectors in the training frame; lower k or train on more data")
      KMeans.saveCentroids(spark, artifact.getAbsolutePath, cents)
      cents
    }
  }

  /** Rewrite accumulated per-batch append files to ONE file per cell in a
    * fresh generation — per-cell file counts back to O(1) no matter how
    * many batches appended; search results unchanged. The replaced
    * generation is kept one cycle for lazy readers. */
  def compact(): Unit = {
    val prev = gens.currentGen()
    postings().foreach { p =>
      val next = gens.newGenDir()
      p.dropDuplicates(idCol)
        .repartition(col("cell"))
        .write.partitionBy("cell").parquet(next.getAbsolutePath)
      gens.swapPointer(next.getName)
      gens.reapExcept(Set(next.getName) ++ prev.map(_.getName))
    }
  }
}
