package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Phrase-blocklist screening — the C4 "bad words" rule: a document that
  * contains ANY listed word or multi-word phrase (word-boundary exact) is
  * dropped from the training corpus. The list is curation policy
  * (hundreds of entries, human-maintained), so it rides into the plan as
  * a literal array and the whole verdict is a scan-stage scalar
  * expression: no shuffle, no join, no UDF — at 100 TB this is a free
  * rider on whatever scan already reads the text column.
  *
  * Word-boundary exactness without regex: both the text and each phrase
  * are space-padded, so `" badword "` cannot match inside
  * `"notbadword"` — byte-identical semantics in the DuckDB oracle's
  * `position()` replay (single-space tokenization is this corpus's
  * contract; swap the padding for a tokenizer-aware join if the corpus
  * needs Unicode word breaks).
  *
  * Reference analog: server-side entry filtering
  * (pulsar-broker/.../plugin/EntryFilterProvider.java) — a per-record
  * accept/reject verdict evaluated where the data already is.
  */
object Blocklist {

  /** Per-document verdict: `n_matches` distinct blocklist entries found
    * and the `keep` decision (no entry matched). */
  def screen(docs: DataFrame, idCol: String, textCol: String,
             phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "empty blocklist")
    docs.select(col(idCol),
      matchCount(col(textCol), phrases).as("n_matches"),
      (matchCount(col(textCol), phrases) === 0L).as("keep"))
  }

  /** Number of distinct listed phrases present in `text` (long). */
  def matchCount(text: Column, phrases: Seq[String]): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    size(filter(array(phrases.map(lit): _*),
      p => contains(padded, concat(lit(" "), p, lit(" "))))).cast("long")
  }
}
