package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators — the reference's broker-side message dedup plus
  * the exact-dedup operator a training-data pipeline needs.
  *
  * Reference: MessageDeduplication keeps a per-producer highest-sequence-id
  * map and drops any append whose sequence id is <= the stored one
  * (reference: pulsar-broker/.../persistent/MessageDeduplication.java:52-366).
  */
object Dedup {

  /** Producer/sequence dedup: exactly one row per (producer, sequence); among
    * duplicates the one with the greatest `pref` wins (the broker keeps the
    * first accepted append; with redeliveries that is the lowest offset —
    * callers pick the preference ordering). Aggregation-based, so map-side
    * partial combine bounds the shuffle at |distinct ids| — scale-safe. */
  def byProducerSeq(df: DataFrame, producerCol: String, seqCol: String,
                    pref: Column): DataFrame =
    Compaction.compact(df, Seq(producerCol, seqCol), pref)

  /** Content key: a single column hashes directly; several columns go
    * through to_json(struct(...)) so field boundaries AND nulls survive --
    * concat_ws skips null columns, which would collide (a, null) with
    * (null, a), silently deduplicating distinct rows. */
  private def contentKey(cols: Seq[String]): Column =
    if (cols.size == 1) col(cols.head)
    else to_json(struct(cols.map(col): _*))

  /** Exact content dedup by hash of normalized content: first-seen (minimum
    * `ord`) row wins. `cols` are the content columns hashed together. */
  def exactByContent(df: DataFrame, cols: Seq[String], ord: Column): DataFrame =
    Compaction.compact(
      df.withColumn("__ck", md5(contentKey(cols))),
      Seq("__ck"), struct(ord * -1)) // min-ord wins = max of negated ord
      .drop("__ck")

  /** Dedup summary: per distinct content hash, the keeper id and duplicate
    * count — the shape audit pipelines want. */
  def exactSummary(df: DataFrame, cols: Seq[String], idCol: String): DataFrame =
    df.groupBy(md5(contentKey(cols)).as("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))
}
