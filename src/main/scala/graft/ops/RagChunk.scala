package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking with overlap — the retrieval-side
  * counterpart of [[Packing]] (which concatenates and re-cuts for a
  * TRAINING loader): a RAG/embedding pipeline instead cuts EACH document
  * into fixed-width token windows that overlap by `window - stride`
  * tokens, so a fact straddling a cut still appears whole in one chunk.
  *
  * Chunk starts step by `stride` from 0; a tail start is kept only if its
  * chunk extends past the previous chunk's end (n_tok - start > window -
  * stride) — a tail that is purely the previous chunk's suffix re-emitted
  * would index duplicate content. All of it is scan-stage expression work
  * (split → sequence → filter → explode → slice): no shuffle anywhere, so
  * the op is embarrassingly parallel at any corpus size, and chunk ids are
  * (doc_id, start/stride) — deterministic under any partitioning.
  *
  * Reference analog: chunked messages split one payload into fixed-size
  * pieces with per-piece ids for reassembly
  * (pulsar-client/.../impl/ChunkMessageIdImpl.java, MessageChunkingTest);
  * here the pieces overlap and the ids serve retrieval, not reassembly.
  */
object RagChunk {

  /** One row per kept chunk: (id, chunk_idx, start_tok, n_tok, chunk_text).
    * `chunk_idx` = start/stride (gaps impossible: every kept start is a
    * stride multiple), `start_tok` the 0-based token offset, `n_tok` ≤
    * `window` the actual width (only the final chunk may be short). */
  def chunks(docs: DataFrame, idCol: String, textCol: String,
             window: Int, stride: Int): DataFrame = {
    require(stride > 0 && stride <= window, s"bad window/stride: $window/$stride")
    val keepTail = window - stride
    docs
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .select(col(idCol), col("__toks"), size(col("__toks")).as("__n"))
      .select(col(idCol), col("__toks"),
        explode(filter(sequence(lit(0), col("__n") - 1, lit(stride)),
          s => (s === 0) || (col("__n") - s > keepTail))).as("__start"))
      .select(
        col(idCol),
        (col("__start").cast("long") / stride).cast("long").as("chunk_idx"),
        col("__start").cast("long").as("start_tok"),
        slice(col("__toks"), col("__start") + 1, lit(window)).as("__ctoks"))
      .select(col(idCol), col("chunk_idx"), col("start_tok"),
        size(col("__ctoks")).as("n_tok"),
        array_join(col("__ctoks"), " ").as("chunk_text"))
  }
}
