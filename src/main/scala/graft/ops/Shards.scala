package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sharding — the LAST step of training-data assembly:
  * deal the curated corpus into `n` shard files in a pseudo-random but fully
  * reproducible order, so every training run (and every resumed run) reads
  * the same example sequence, and a re-run on a differently-partitioned
  * cluster produces byte-identical shards.
  *
  * Reference analog: partitioned-topic routing spreads a logical stream over
  * partitions by key hash (pulsar-client/.../RoundRobinPartitionMessageRouterImpl.java,
  * HashingScheme); an epoch shuffle is the batch counterpart — hash-route
  * every document, then fix a total order inside each shard.
  *
  * Everything derives from `md5(seed ‖ ':' ‖ id)`:
  *  - **shard** = first-8-hex-nibbles mod n — a pure projection, no driver
  *    state, stable under repartitioning and incremental growth;
  *  - **pos**   = rank of the full hex digest inside the shard — one
  *    hash-partitioned window (the one shuffle an epoch shuffle inherently
  *    costs); changing `seed` re-deals the epoch.
  *
  * At 100 TB: the window sorts each shard's keys only (n ≫ executor count
  * spreads them), and the digest sort key is 32 bytes — the sort never
  * touches document payloads; join positions back to content on write.
  */
object Shards {

  /** Hex nibble `i` (1-based) of md5 column `h` as an int 0..15 — ascii
    * arithmetic replayed verbatim by the DuckDB oracle. */
  private def nib(h: Column, i: Int): Column = {
    val a = ascii(substring(h, i, 1))
    when(a <= 57, a - 48).otherwise(a - 87)
  }

  /** First 8 md5 nibbles as a 32-bit non-negative long. */
  private def hex32(h: Column): Column =
    (1 to 8).map(i => nib(h, i).cast("long") * (1L << (4 * (8 - i))))
      .reduce(_ + _)

  /** One epoch's deal: (id, shard, pos) for every input row.
    * `pos` is dense 0-based within its shard, ordered by (digest, id) —
    * a total order, so ties in the 128-bit digest cannot flip ranks. */
  def epochShuffle(df: DataFrame, idCol: String, seed: Long,
                   nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards $nShards must be positive")
    val h = md5(concat(lit(s"$seed:"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col(idCol))
    df.select(col(idCol), h.as("h"))
      .withColumn("shard", pmod(hex32(col("h")), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Materialize one epoch: `shard=NNN/` directories, each holding its
    * documents physically ordered by [[epochShuffle]] position — a training
    * reader streams each shard file sequentially and sees the dealt order,
    * no shuffle buffer needed. One extra id-join puts payloads back on the
    * (id, shard, pos) deal; `partitionBy` splits directories while
    * `sortWithinPartitions` fixes the row order inside each file. Re-runs
    * (any cluster size) produce identical shard contents and order. */
  def writeEpoch(df: DataFrame, idCol: String, seed: Long, nShards: Int,
                 outDir: String): Unit =
    df.join(epochShuffle(df, idCol, seed, nShards), Seq(idCol))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)

  /** Deterministic train/val/test assignment: bucket = first-8-nibble hash
    * mod 100, split by cumulative percentage. `splits` are (name, pct) in
    * bucket order; pcts must sum to 100. A pure projection — no shuffle, no
    * state; a document's split never changes as the corpus grows. */
  def splitAssign(df: DataFrame, idCol: String, seed: Long,
                  splits: Seq[(String, Int)]): DataFrame =
    splitAssignByKey(df, idCol, idCol, seed, splits)
      .drop("split_key")

  /** [[splitAssign]] hashed on `keyCol` instead of the row id: every row
    * sharing a key lands in the SAME split by construction. The
    * leakage-free variant — key on the near-dup cluster id
    * ([[Components.connected]] output) and no near-duplicate pair can
    * straddle train/test, the held-out contamination mode a per-doc hash
    * split cannot rule out. Still a pure projection over (id, key). */
  def splitAssignByKey(df: DataFrame, idCol: String, keyCol: String,
                       seed: Long, splits: Seq[(String, Int)]): DataFrame = {
    require(splits.map(_._2).sum == 100,
      s"split percentages ${splits.map(_._2)} must sum to 100")
    val h = md5(concat(lit(s"$seed:"), col(keyCol).cast("string")))
    val bucket = pmod(hex32(h), lit(100L))
    val cuts = splits.scanLeft(0)(_ + _._2).tail // cumulative upper bounds
    val expr = splits.zip(cuts).foldRight(lit(splits.last._1): Column) {
      case (((name, _), cut), acc) => when(bucket < cut, name).otherwise(acc)
    }
    df.select(col(idCol), col(keyCol).as("split_key"), bucket.as("bucket"),
      expr.as("split"))
  }
}
