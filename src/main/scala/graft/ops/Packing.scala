package graft.ops

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing — the step that turns a curated corpus
  * into fixed-length training sequences: documents are laid end-to-end in a
  * deterministic shuffled order and the stream is cut every `ctxLen` tokens.
  * A document whose token range crosses a cut boundary spans consecutive
  * sequences, exactly as a real pretraining loader splits it.
  *
  * Scale shape: one hash-partitioned running-sum window per shard group —
  * no global ordering, no driver state; shards (language, or any hash
  * bucket column) pack independently and in parallel. Order within a shard
  * is md5(key) (the [[Sampling]] convention), so the "shuffle" is
  * reproducible on any cluster and replay-stable, and the assignment is
  * pure integer arithmetic — a SQL oracle verifies it exactly.
  */
object Packing {

  private def hashOf(key: Column): Column = md5(key.cast("string"))

  /** Adds the packed position of each row to `df`:
    *
    *  - `start_tok`  — token offset of the row's first token in its shard's
    *    concatenated stream;
    *  - `seq_first` / `seq_last` — ids of the `ctxLen`-token training
    *    sequences holding the row's first and last token (different when
    *    the row crosses one or more cut boundaries).
    *
    * `tokens` must be positive for every row (a zero-token row has no
    * position in the stream — filter such rows out first).
    *
    * SKEW WARNING: the whole shard group funnels through ONE task's
    * running-sum sort. Sharding 100 TB by a handful of languages puts each
    * language on a single task; callers whose shard cardinality is small
    * relative to the cluster must add a salt — [[packChunksSalted]] does
    * it deterministically and keeps sequence ids collision-free. */
  def packChunks(df: DataFrame, shard: Seq[String], key: Column,
                 tokens: Column, ctxLen: Long): DataFrame = {
    require(ctxLen > 0, s"ctxLen $ctxLen must be positive")
    val w = Window.partitionBy(shard.map(col): _*)
      .orderBy(hashOf(key), key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(tokens).over(w))
      .withColumn("start_tok", (col("__cum") - tokens).cast("long"))
      // integer `div`, not floor(a / b): long/long division in Spark
      // promotes to double, which loses ulps past 2^53 tokens — the oracle
      // computes exact integer division, and so must we at any scale
      .withColumn("seq_first", expr(s"start_tok div ${ctxLen}L"))
      .withColumn("seq_last", expr(s"(__cum - 1) div ${ctxLen}L"))
      .drop("__cum")
  }

  /** Pack ID ARRAYS into complete fixed-length training records: documents
    * (as `input_ids` rows, e.g. [[Bpe.encodeIds]] output) are laid
    * end-to-end per shard in the deterministic md5 order and re-cut into
    * `ctxLen`-id rows — the final materialization a pretraining loader
    * reads. A document crossing a cut boundary spans consecutive records;
    * the partial tail record of each shard is dropped (standard loader
    * behavior). Returns (shard..., chunk, input_ids).
    *
    * Scale shape: one running-offset window over per-document COUNTS (the
    * arrays are not in the window), then one explode + one group-by-chunk
    * — both corpus-token-linear, no driver state. The [[packChunks]] skew
    * warning applies identically: salt small shard cardinalities. */
  def packIds(records: DataFrame, shard: Seq[String], key: Column,
              idsCol: String, ctxLen: Long): DataFrame = {
    require(ctxLen > 0, s"ctxLen $ctxLen must be positive")
    val w = Window.partitionBy(shard.map(col): _*)
      .orderBy(hashOf(key), key)
      .rowsBetween(Window.unboundedPreceding, -1)
    val rec = records
      .withColumn("__n", size(col(idsCol)).cast("long"))
      .where(col("__n") > 0)
      .withColumn("__start", coalesce(sum(col("__n")).over(w), lit(0L)))
    rec
      .select(shard.map(col) :+ col("__start") :+
        posexplode(col(idsCol)).as(Seq("__p", "__id")): _*)
      .withColumn("__gpos", col("__start") + col("__p"))
      .withColumn("chunk", expr(s"__gpos div ${ctxLen}L"))
      .groupBy(shard.map(col) :+ col("chunk"): _*)
      .agg(count(lit(1)).as("__cnt"),
        transform(array_sort(collect_list(struct(col("__gpos"), col("__id")))),
          x => x.getField("__id")).as("input_ids"))
      .where(col("__cnt") === ctxLen)
      .select(shard.map(col) :+ col("chunk") :+ col("input_ids"): _*)
  }

  /** The packed layout's DOCUMENT-SEGMENT table: for every full chunk of
    * [[packIds]], which documents occupy it and where —
    * (shard..., chunk, key, seg_start, seg_len), `seg_start` the offset
    * inside the chunk. This is the attention-mask/boundary metadata a
    * packed-pretraining loader needs beside `input_ids` (mask cross-doc
    * attention, reset position ids) and the provenance map back from a
    * chunk to its source documents.
    *
    * Computed WITHOUT exploding ids: the same running-offset window as
    * [[packIds]] (plus the shard total, same partitioning, to drop the
    * partial tail chunk), then each document emits only its overlapped
    * chunk range — output is segment-sized, not token-sized. */
  def packSegments(records: DataFrame, shard: Seq[String], keyCol: String,
                   idsCol: String, ctxLen: Long): DataFrame = {
    require(ctxLen > 0, s"ctxLen $ctxLen must be positive")
    val w = Window.partitionBy(shard.map(col): _*)
      .orderBy(hashOf(col(keyCol)), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(shard.map(col): _*)
    val rec = records
      .withColumn("__n", size(col(idsCol)).cast("long"))
      .where(col("__n") > 0)
      .withColumn("__start", coalesce(sum(col("__n")).over(w), lit(0L)))
      .withColumn("__total", sum(col("__n")).over(wAll))
    rec
      .withColumn("chunk", explode(sequence(
        expr(s"__start div ${ctxLen}L"),
        expr(s"(__start + __n - 1) div ${ctxLen}L"))))
      .where(col("chunk") < expr(s"__total div ${ctxLen}L"))
      .withColumn("seg_start",
        greatest(lit(0L), col("__start") - col("chunk") * ctxLen))
      .withColumn("seg_len",
        least((col("chunk") + 1) * ctxLen, col("__start") + col("__n")) -
          greatest(col("chunk") * ctxLen, col("__start")))
      .select(shard.map(col) ++ Seq(col("chunk"), col(keyCol),
        col("seg_start"), col("seg_len")): _*)
  }

  /** Deterministic salt in [0, n): the md5-nibble [[TextFunctions.hash16]]
    * of the pack key, modulo n — ascii arithmetic only, so any SQL engine
    * reproduces the assignment exactly (same convention as the pack
    * order's md5 hash). */
  def saltedShard(key: Column, n: Int): Column = {
    require(n > 0, s"salt count $n must be positive")
    pmod(TextFunctions.hash16(key.cast("string")), lit(n))
  }

  /** [[packChunks]] with the skew guard built in: each shard splits into
    * `salts` deterministic hash streams that pack independently — the
    * per-task sort is bounded at ~1/salts of the shard, so a
    * handful-of-languages shard survives a 100 TB corpus. Sequence ids
    * are namespaced per salt (`+ salt × seqSpan`) so streams never
    * collide; `start_tok` stays stream-local. Emits the `salt` column so
    * consumers (and oracles) see the stream id. `seqSpan` must exceed any
    * stream's sequence count — i.e. stream tokens < seqSpan × ctxLen
    * (defaults allow 2⁴⁰ sequences per stream). */
  def packChunksSalted(df: DataFrame, shard: Seq[String], key: Column,
                       tokens: Column, ctxLen: Long, salts: Int,
                       seqSpan: Long = 1L << 40): DataFrame = {
    require(seqSpan > 0, s"seqSpan $seqSpan must be positive")
    val salted = df.withColumn("__salt", saltedShard(key, salts))
    packChunks(salted, shard :+ "__salt", key, tokens, ctxLen)
      .withColumn("seq_first",
        col("seq_first") + col("__salt").cast("long") * seqSpan)
      .withColumn("seq_last",
        col("seq_last") + col("__salt").cast("long") * seqSpan)
      .withColumnRenamed("__salt", "salt")
  }
}
