package graft.ops

import graft.functions.VectorFunctions.cosine
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup — semantic deduplication in embedding space (Abbas et al. 2023,
  * "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication", public arXiv 2303.09540): documents whose EMBEDDINGS are
  * ε-close are near-identical in meaning even when no textual fingerprint
  * overlaps (translations, templated rewrites, boilerplate paraphrases).
  * Keep one representative per ε-similar group, drop the rest.
  *
  * Reference analog: topic compaction keeps one record per key and discards
  * superseded payloads (pulsar-broker/.../compaction/TwoPhaseCompactor.java);
  * here the "key" is an emergent semantic neighborhood, discovered rather
  * than declared.
  *
  * Scale shape: the paper's design IS the scale design — a coarse partition
  * (k-means cell, [[graft.ops.KMeans.assignExpr]], or any blocking column)
  * bounds all pairwise work inside blocks, so the candidate join shuffles
  * once on the block key and never goes all-pairs global. ε-groups are
  * closed with the O(log² n) alternating-star closure ([[Components]]), not
  * per-block windows, so a degenerate block cannot pin a single task.
  */
object SemDedup {

  /** ε-similar pairs within a block: (id_a, id_b) with id_a < id_b and
    * cosine ≥ `tau`. One shuffle on the block key; the dot product is the
    * codegen'd double-accumulation primitive. */
  def pairs(emb: DataFrame, idCol: String, vecCol: String, blockCol: String,
            tau: Double): DataFrame = {
    val e = Par.spread(emb.select(col(idCol), col(vecCol), col(blockCol)))
    val a = e.select(col(idCol).as("id_a"), col(vecCol).as("__va"),
      col(blockCol).as("__blk"))
    val b = e.select(col(idCol).as("id_b"), col(vecCol).as("__vb"),
      col(blockCol).as("__blk_b"))
    a.join(b, col("__blk") === col("__blk_b") && col("id_a") < col("id_b"))
      .where(cosine(col("__va"), col("__vb")) >= tau)
      .select(col("id_a"), col("id_b"))
  }

  /** Every member of an ε-group labeled with its group (component = the
    * group's smallest id). Singletons are absent — they have no pair. */
  def clusters(emb: DataFrame, idCol: String, vecCol: String,
               blockCol: String, tau: Double): DataFrame =
    Components.connected(pairs(emb, idCol, vecCol, blockCol, tau),
        "id_a", "id_b")
      .withColumnRenamed("id", idCol)

  /** The semantically deduplicated corpus: the smallest id of every ε-group
    * survives, every other member is dropped, untouched rows pass through.
    * An anti-join against the (small) non-keeper id set — the corpus is
    * scanned once and never widened. */
  def prune(emb: DataFrame, idCol: String, vecCol: String, blockCol: String,
            tau: Double): DataFrame = {
    val dropped = clusters(emb, idCol, vecCol, blockCol, tau)
      .where(col(idCol) =!= col("component"))
      .select(col(idCol))
    emb.join(dropped, Seq(idCol), "left_anti")
  }
}
