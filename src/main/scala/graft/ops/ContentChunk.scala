package graft.ops

import graft.functions.TextFunctions.hash16
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Content-defined chunking (the LBFS/rsync/restic boundary discipline at
  * token granularity): a chunk boundary falls AFTER every token whose
  * hash ≡ 0 (mod `div`), so expected chunk length is `div` tokens and —
  * the property fixed-size windows lack — an insertion or deletion early
  * in a document shifts only the chunk it lands in; every later boundary
  * is re-derived from the same token content and realigns. Chunk hashes
  * therefore keep matching across document versions, which is what makes
  * chunk-level dedup/delta-storage work on edited corpora.
  *
  * '''Determinism.''' The boundary hash is the md5-nibble [[hash16]] the
  * whole text stack uses — the oracle replays boundaries, chunk ids,
  * and chunk hashes bit-for-bit.
  *
  * '''Scale shape.''' One posexplode over tokens, ONE window partitioned
  * by document (running boundary count = chunk index — per-doc state
  * never crosses documents, so the shuffle key is the natural document
  * key), one rollup per (doc, chunk). Payload strings shuffle once as
  * tokens; no self-joins.
  */
object ContentChunk {

  /** (doc, chunk_idx, start_tok, n_toks, chunk_hash) per content-defined
    * chunk; `chunk_hash` = md5 of the space-joined chunk tokens. */
  def chunks(docs: DataFrame, idCol: String, textCol: String,
             div: Int): DataFrame = {
    require(div >= 2, s"bad divisor $div")
    val toks = docs.select(col(idCol),
        posexplode(filter(split(col(textCol), " "), t => t =!= ""))
          .as(Seq("pos", "tok")))
    // boundary AFTER token t iff hash16(t) % div == 0; a token's chunk
    // index = number of boundaries strictly before it
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val flagged = toks.withColumn("__b",
        when(hash16(col("tok")) % div === 0, 1L).otherwise(0L))
      .withColumn("chunk_idx", coalesce(sum(col("__b")).over(w), lit(0L)))
    flagged.groupBy(col(idCol), col("chunk_idx"))
      .agg(min(col("pos")).cast("long").as("start_tok"),
        count(lit(1)).as("n_toks"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok")), " ")).as("chunk_hash"))
  }
}
