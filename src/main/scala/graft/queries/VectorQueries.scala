package graft.queries

import graft.core.Tables
import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`embedding: array<float>`):
  * brute-force cosine top-k baseline, IVF-style coarse-cell ANN, and
  * LSH-bucketed ANN (no SQL oracle — bucket assignment is engine-side).
  */
object VectorQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Trained-index cache: a coarse quantizer is a reusable artifact (real
    * deployments persist IVF centroids next to the table), so queries
    * sharing (table, k, iters) train once per process instead of re-running
    * k-means per query. */
  private val centroidCache =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Int), Array[Array[Double]]]
  private def centroidsFor(s: SparkSession, d: String, k: Int,
                           iters: Int): Array[Array[Double]] =
    centroidCache.getOrElseUpdate((d, k, iters),
      graft.ops.KMeans.fit(Tables.embeddings(s, d), "vec_id", "embedding", k, iters))

  val queries: Map[String, Q] = Map(
    // Exact cosine top-5 for a broadcast query set vs the whole corpus.
    "q_embed_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(
        emb.where(col("vec_id") < 20), emb, "vec_id", "embedding", 5)
    }),

    // IVF-style ANN: search only the query's coarse cell (label).
    "q_ann_ivf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfTopK(
        emb.where(col("vec_id") < 20), emb, "vec_id", "embedding", "label", 3)
    }),

    // LSH-bucketed ANN over the whole corpus (rows-only check: the
    // sign-random-projection planes are engine-side state).
    "q_ann_lsh" -> ((s, d) => {
      Similarity.lshTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        dim = 64, numPlanes = 8, k = 3)
    }),

    // IVF with TRAINED coarse cells (k-means; rows-only — learned model
    // state has no SQL oracle).
    "q_ann_ivf_trained" -> ((s, d) => {
      val cents = centroidsFor(s, d, k = 8, iters = 3)
      val indexed = Tables.embeddings(s, d).withColumn("cell",
        graft.ops.KMeans.assignExpr(col("embedding"), cents))
      Similarity.ivfTopK(indexed.where(col("vec_id") < 10), indexed,
        "vec_id", "embedding", "cell", 3)
    }),

    // Multi-probe IVF (rows-only — trained centroids are engine-side state):
    // each query probes its 4 nearest cells, the production recall setting.
    "q_ann_ivf_multiprobe" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cents = centroidsFor(s, d, k = 8, iters = 3)
      Similarity.ivfTopKProbed(emb.where(col("vec_id") < 10), emb,
        "vec_id", "embedding", cents, nprobe = 4, k = 3)
    }),

    // Embedding-cosine near-dup dedup within the coarse cell.
    "q_embed_dedup" -> ((s, d) => {
      Similarity.cosineDedup(Tables.embeddings(s, d), "vec_id", "embedding",
        "label", threshold = 0.35)
    })
  )

  /** Dot products in the oracle are computed positionally in double via a
    * 64-element range join — same accumulation the Spark side's
    * `aggregate(zip_with(...))` does. */
  private def cosineCte(queryPred: String) =
    s"""q AS (SELECT vec_id AS query_id, embedding AS qe, label FROM embeddings
              WHERE $queryPred),
        c AS (SELECT vec_id AS neighbor_id, embedding AS ce, label AS c_label
              FROM embeddings),
        dots AS (
          SELECT query_id, neighbor_id, q.label AS q_label, c_label,
                 sum(CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)) AS dp,
                 sum(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)) AS nq,
                 sum(CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)) AS nc
          FROM q, c, LATERAL unnest(range(1, 65)) AS t(i)
          WHERE query_id <> neighbor_id
          GROUP BY query_id, neighbor_id, q.label, c_label)"""

  val oracleSql: Map[String, String] = Map(
    "q_embed_topk" ->
      s"""WITH ${cosineCte("vec_id < 20")}
          SELECT query_id, neighbor_id, round(sim, 6) AS sim, rank FROM (
            SELECT query_id, neighbor_id, dp / (sqrt(nq) * sqrt(nc)) AS sim,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY dp / (sqrt(nq) * sqrt(nc)) DESC, neighbor_id ASC)
                     AS rank
            FROM dots)
          WHERE rank <= 5""",
    "q_embed_dedup" ->
      """WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
          dots AS (
            SELECT a.vec_id AS doc_a, b.vec_id AS dup_id,
                   sum(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)) AS dp,
                   sum(CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)) AS na,
                   sum(CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)) AS nb
            FROM e a
            JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id,
            LATERAL unnest(range(1, 65)) AS t(i)
            GROUP BY a.vec_id, b.vec_id),
          sims AS (
            SELECT doc_a, dup_id, dp / (sqrt(na) * sqrt(nb)) AS sim FROM dots
            WHERE dp / (sqrt(na) * sqrt(nb)) >= 0.35)
          SELECT dup_id, doc_a AS keeper_id, round(sim, 6) AS sim FROM (
            SELECT dup_id, doc_a, sim,
                   row_number() OVER (PARTITION BY dup_id ORDER BY doc_a) AS rn
            FROM sims)
          WHERE rn = 1""",
    "q_ann_ivf" ->
      s"""WITH ${cosineCte("vec_id < 20")}
          SELECT query_id, neighbor_id, round(sim, 6) AS sim, rank FROM (
            SELECT query_id, neighbor_id, dp / (sqrt(nq) * sqrt(nc)) AS sim,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY dp / (sqrt(nq) * sqrt(nc)) DESC, neighbor_id ASC)
                     AS rank
            FROM dots WHERE q_label = c_label)
          WHERE rank <= 3"""
  )
}
