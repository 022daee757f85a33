package graft.ops

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k with the (small) query set broadcast —
  * the candidate corpus is only scanned, never shuffled, so this is the
  * correct 100 TB shape for "few queries × huge corpus". Scale paths: IVF
  * (coarse-cluster pre-filter — candidates shuffle only within the probed
  * cells) and sign-random-projection LSH bucketing.
  */
object Similarity {

  /** Shared scoring shape: corpus side joined to the BROADCAST prepared
    * query side on `key`, self-pairs dropped, cosine-scored. One place so
    * the single-probe and probe-profile variants (and [[IvfIndex]]) cannot
    * drift. */
  private[ops] def scoreAgainst(c: DataFrame, q: DataFrame, key: String,
                                dropSelf: Boolean = true): DataFrame = {
    val joined = c.join(broadcast(q), key)
    // in-corpus searches drop self-pairs; CROSS-corpus callers must keep
    // them — equal ids across two corpora (shared content-hash or doc-id
    // schemes) are real matches, not self-hits
    val filtered =
      if (dropSelf) joined.where(col("query_id") =!= col("neighbor_id"))
      else joined
    filtered.withColumn("sim", cosine(col("__qv"), col("__cv")))
  }

  /** Shared top-k tail: rank per `groupCols` by (sim desc, neighbor asc) —
    * the deterministic tie-break every oracle reproduces — keep k, round. */
  private[ops] def topK(scored: DataFrame, k: Int,
                        groupCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(groupCols.map(col) ++ Seq(col("neighbor_id"),
        round(col("sim"), 6).as("sim"), col("rank")): _*)
  }

  /** Exact top-k cosine neighbors for each query vector. `queries` must be
    * small (it is broadcast); `candidates` can be arbitrarily large. */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val c = Par.spread(candidates
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv")))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("__qv"), col("__cv")))
    topK(scored, k, Seq("query_id"))
  }

  /** IVF-style ANN: only candidates in the query's coarse cell (`cellCol`) are
    * scored. With an upstream k-means assignment this is classic IVF; any
    * precomputed partition label works. */
  def ivfTopK(queries: DataFrame, candidates: DataFrame, idCol: String,
              vecCol: String, cellCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      col(cellCol).as("__cell"))
    val c = Par.spread(candidates.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv"), col(cellCol).as("__cell")))
    topK(scoreAgainst(c, q, "__cell"), k, Seq("query_id"))
  }

  /** Multi-probe IVF ANN: candidates are assigned their ONE nearest cell;
    * each query probes its `nprobe` nearest cells
    * ([[KMeans.probeExpr]]) — the standard IVF recall lever (a query near a
    * cell boundary finds neighbors in the adjacent cell). The probe fan-out
    * multiplies only the broadcast query side; the corpus is still scanned
    * once, never shuffled. */
  def ivfTopKProbed(queries: DataFrame, candidates: DataFrame, idCol: String,
                    vecCol: String, centroids: Array[Array[Double]],
                    nprobe: Int, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__cell",
        explode(KMeans.probeExpr(col("__qv"), centroids, nprobe)))
    val c = Par.spread(candidates.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv")))
      .withColumn("__cell", KMeans.assignExpr(col("__cv"), centroids))
    topK(scoreAgainst(c, q, "__cell"), k, Seq("query_id"))
  }

  /** Multi-probe IVF ANN over a PRE-ASSIGNED corpus — the read face of a
    * persisted cell-materialized index (`cellCol` written once at
    * ingest/artifact-build time, the [[IvfIndex]]/[[graft.queries
    * .Artifacts]] posture): per query the `nprobe` nearest cells are
    * probed, and only probed-cell rows are scored. Unlike
    * [[ivfTopKProbed]] the corpus is NOT re-assigned per run — at scale
    * the per-query cost is the probed-cell candidate volume, not a
    * corpus-wide distance pass, which is the whole point of persisting
    * the index. */
  def ivfTopKPreassigned(queries: DataFrame, candidates: DataFrame,
                         idCol: String, vecCol: String, cellCol: String,
                         centroids: Array[Array[Double]],
                         nprobe: Int, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__cell",
        explode(KMeans.probeExpr(col("__qv"), centroids, nprobe)))
    val c = Par.spread(candidates.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv"), col(cellCol).as("__cell")))
    topK(scoreAgainst(c, q, "__cell"), k, Seq("query_id"))
  }

  /** [[ivfProbeProfile]] over a PRE-ASSIGNED corpus — the tuning loop's
    * read face when the cell column is already materialized: several
    * probe budgets profiled in one pass without re-assigning the corpus. */
  def ivfProbeProfilePreassigned(queries: DataFrame, candidates: DataFrame,
                                 idCol: String, vecCol: String,
                                 cellCol: String,
                                 centroids: Array[Array[Double]],
                                 probes: Seq[Int], k: Int): DataFrame = {
    val maxProbe = probes.max
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__cells", KMeans.probeExpr(col("__qv"), centroids, maxProbe))
      .withColumn("nprobe", explode(typedlit(probes)))
      .withColumn("__cell", explode(slice(col("__cells"), lit(1), col("nprobe"))))
      .drop("__cells")
    val c = Par.spread(candidates.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv"), col(cellCol).as("__cell")))
    topK(scoreAgainst(c, q, "__cell"), k, Seq("nprobe", "query_id"))
  }

  /** Probe-setting profile in ONE corpus pass: the query side explodes
    * (nprobe variant × probed cell), so comparing several recall settings
    * multiplies only the broadcast side — the corpus is scanned and
    * cell-assigned exactly once. Returns top-k per (nprobe, query):
    * (nprobe, query_id, neighbor_id, sim, rank). Used to hard-check the
    * IVF recall/monotonicity contract against the exact brute-force result. */
  def ivfProbeProfile(queries: DataFrame, candidates: DataFrame, idCol: String,
                      vecCol: String, centroids: Array[Array[Double]],
                      probes: Seq[Int], k: Int): DataFrame = {
    val maxProbe = probes.max
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__cells", KMeans.probeExpr(col("__qv"), centroids, maxProbe))
      .withColumn("nprobe", explode(typedlit(probes)))
      .withColumn("__cell", explode(slice(col("__cells"), lit(1), col("nprobe"))))
      .drop("__cells")
    val c = Par.spread(candidates.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv")))
      .withColumn("__cell", KMeans.assignExpr(col("__cv"), centroids))
    topK(scoreAgainst(c, q, "__cell"), k, Seq("nprobe", "query_id"))
  }

  /** Multi-probe LSH profile in ONE corpus pass — the SRP analog of
    * [[ivfProbeProfile]]: each query probes its own bucket plus one-bit
    * flips in increasing-margin order ([[graft.functions.VectorFunctions
    * .srpProbeBuckets]]); the probe fan-out multiplies only the broadcast
    * query side, the corpus is scanned and bucketed exactly once. Probe
    * sets nest (budget m's buckets are a prefix of budget m+1's), so hits
    * against an exact baseline are monotone in the budget by construction —
    * the contract the composite recall query hard-checks. Returns top-k per
    * (nprobe, query). */
  def lshProbeProfile(queries: DataFrame, candidates: DataFrame, idCol: String,
                      vecCol: String, dim: Int, numPlanes: Int,
                      probes: Seq[Int], k: Int): DataFrame = {
    val maxProbe = probes.max
    require(maxProbe <= numPlanes + 1,
      s"probe budget $maxProbe exceeds own bucket + $numPlanes one-bit flips")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__buckets",
        slice(srpProbeBuckets(col("__qv"), numPlanes, dim), 1, maxProbe))
      .withColumn("nprobe", explode(typedlit(probes)))
      .withColumn("__bucket",
        explode(slice(col("__buckets"), lit(1), col("nprobe"))))
      .drop("__buckets")
    val c = Par.spread(candidates.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv")))
      .withColumn("__bucket", srpBucket(col("__cv"), numPlanes, dim))
    topK(scoreAgainst(c, q, "__bucket"), k, Seq("nprobe", "query_id"))
  }

  /** Per-budget recall@k of a probe profile against the exact top-k result:
    * one (nprobe, recall) row per budget, budgets with zero hits included.
    * `profile` is [[ivfProbeProfile]]/[[lshProbeProfile]] output; `exact` is
    * the brute-force (query_id, neighbor_id) slots on the SAME sample. */
  def probeRecalls(profile: DataFrame, exact: DataFrame,
                   budgets: Seq[Int]): DataFrame = {
    val slots = exact.agg(count(lit(1)).as("__slots"))
    val hits = profile.select(col("nprobe"), col("query_id"), col("neighbor_id"))
      .join(exact.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"))
      .groupBy(col("nprobe")).agg(count(lit(1)).as("__hits"))
    slots.select(explode(typedlit(budgets)).as("nprobe"), col("__slots"))
      .join(hits, Seq("nprobe"), "left")
      .select(col("nprobe"),
        // an empty sample must fail loudly, not propagate NULL recalls into
        // a silent max-budget "choice" with target_met = NULL
        when(col("__slots") === 0, raise_error(lit(
          "probeRecalls: exact result is empty — the query sample matched " +
            "no rows, so recall is undefined")))
          .otherwise(coalesce(col("__hits"), lit(0)) / col("__slots"))
          .as("recall"))
  }

  /** Probe-budget auto-tuning against a recall target — the standard
    * IVF/LSH tuning loop as one distributed query: profile a SAMPLE of
    * queries at every candidate budget (one corpus scan via the profile
    * functions), measure recall@k against the exact brute-force on that
    * sample, and choose the SMALLEST budget meeting `targetRecall`, falling
    * back to the largest when none does (`target_met` reports which).
    * Returns one row (chosen_nprobe, achieved_recall, target_met). At scale
    * the sample is small and broadcast; the corpus is scanned once. */
  def chooseProbeBudget(recalls: DataFrame,
                        targetRecall: Double): DataFrame = {
    val chosen = recalls.agg(
      min(when(col("recall") >= targetRecall, col("nprobe"))).as("__met"),
      max(col("nprobe")).as("__max"))
      .select(coalesce(col("__met"), col("__max")).as("chosen_nprobe"))
    chosen.join(recalls, chosen("chosen_nprobe") === recalls("nprobe"))
      .select(col("chosen_nprobe"),
        round(col("recall"), 6).as("achieved_recall"),
        (col("recall") >= targetRecall).as("target_met"))
  }

  /** Embedding-cosine near-duplicate dedup: within a blocking key (coarse
    * cell / LSH bucket — never all-pairs global), pairs with cosine ≥
    * `threshold` mark the higher id as a duplicate of the lowest matching id.
    * Returns (dup_id, keeper_id, sim). The block join shuffles on the block
    * key; scoring is the codegen'd dot product. */
  def cosineDedup(df: DataFrame, idCol: String, vecCol: String,
                  blockCol: String, threshold: Double): DataFrame = {
    val spreadDf = Par.spread(df.select(col(idCol), col(vecCol), col(blockCol)))
    val a = spreadDf.select(col(idCol).as("doc_a"), col(vecCol).as("__va"),
      col(blockCol).as("__blk"))
    val b = spreadDf.select(col(idCol).as("dup_id"), col(vecCol).as("__vb"),
      col(blockCol).as("__blk_b"))
    a.join(b, col("__blk") === col("__blk_b") && col("doc_a") < col("dup_id"))
      .withColumn("sim", cosine(col("__va"), col("__vb")))
      .where(col("sim") >= threshold)
      .groupBy(col("dup_id"))
      .agg(min_by(struct(col("doc_a"), col("sim")), col("doc_a")).as("k"))
      .select(col("dup_id"), col("k.doc_a").as("keeper_id"),
        round(col("k.sim"), 6).as("sim"))
  }

  /** LSH-bucketed ANN: sign-random-projection bucket as the blocking key; only
    * same-bucket candidates are scored. Recall trades off with `numPlanes`. */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String, dim: Int,
              numPlanes: Int, k: Int): DataFrame = {
    val bucketed = Par.spread(df.select(col(idCol), col(vecCol)))
      .select(col(idCol), col(vecCol),
        srpBucket(col(vecCol), numPlanes, dim).as("__bucket"))
    val a = bucketed.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      col("__bucket"))
    val b = bucketed.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      col("__bucket"))
    val scored = a.join(b, "__bucket")
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("__qv"), col("__cv")))
    topK(scored, k, Seq("query_id"))
  }
}
