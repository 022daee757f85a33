package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chunked (oversized) message handling: producers split a large payload into
  * numChunks pieces sharing a uuid; the consumer reassembles them in chunk_id
  * order (reference: PulsarApi.proto:159-162 uuid/num_chunks/chunk_id;
  * reassembly ConsumerImpl.java:1365-1447).
  *
  * Spark-first: a single groupBy(uuid) aggregation — array_agg sorted by
  * chunk_id, concatenated. Map-side partial aggregation keeps the shuffle at
  * one row per chunk (not per byte), and incomplete groups are either dropped
  * or surfaced, like the consumer's maxPendingChunkedMessage expiry. */
object Chunking {

  /** Split rows into chunks of `chunkBytes` — the producer side.
    * Output: (uuid, chunk_id, num_chunks, chunk_payload). */
  def split(df: DataFrame, idCol: String, payloadCol: String,
            chunkBytes: Int): DataFrame = {
    val total = length(col(payloadCol))
    // An empty payload is one empty chunk (not zero): sequence(0, -1) would
    // emit bogus descending chunks and the message would never reassemble.
    val n = greatest(ceil(total.cast("double") / chunkBytes).cast("int"), lit(1))
    df.select(
      col(idCol).cast("string").as("uuid"),
      n.as("num_chunks"),
      posexplode(transform(sequence(lit(0), n - 1),
        i => substring(col(payloadCol), (i * chunkBytes) + 1, lit(chunkBytes)))))
      .withColumnRenamed("pos", "chunk_id")
      .withColumnRenamed("col", "chunk_payload")
  }

  /** Reassemble chunks; incomplete messages (missing chunks) are dropped,
    * mirroring consumer-side expiry of pending chunked messages. Redelivered
    * duplicate chunks are deduplicated inside the aggregation (the reference
    * consumer dedups by chunk_id) — a raw count(*) would drop a complete
    * message on one duplicate, or accept duplicate+missing as complete. */
  def reassemble(chunks: DataFrame): DataFrame =
    chunks.groupBy(col("uuid"))
      .agg(
        max(col("num_chunks")).as("expected"),
        array_distinct(sort_array(collect_list(
          struct(col("chunk_id"), col("chunk_payload"))))).as("cs"))
      .where(size(col("cs")) === col("expected"))
      .select(col("uuid"),
        concat_ws("", transform(col("cs"),
          c => c.getField("chunk_payload"))).as("payload"))
}
