package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WITHIN-document repeated-line removal — the C4/FineWeb intra-page rule
  * that strips a page's own repeated lines (cookie banners rendered twice,
  * repeated headings, paginated boilerplate) while cross-document
  * recurrence stays [[ParagraphDedup]]'s job: the two compose, this one
  * first (a line repeated inside one page would otherwise inflate that
  * page's weight in the corpus-wide keeper election).
  *
  * Keep-FIRST per document, order preserved: line i survives iff no
  * earlier identical line exists — expressed as the first-occurrence test
  * `array_position(lines, x) == i + 1` inside an indexed filter lambda, so
  * the whole op is scan-stage expression work (no shuffle, no join, no
  * per-row UDF; the quadratic membership scan is bounded by a single
  * document's line count).
  *
  * Reference analog: broker deduplication suppresses a producer's
  * re-sends WITHIN one topic by remembering what it has already seen
  * (pulsar-broker/.../persistent/MessageDeduplication.java); this is the
  * same highest-seen contract scoped to one document's line stream. */
object LineDedup {

  /** First occurrence of each element, order preserved. */
  def keepFirst(lines: Column): Column =
    filter(lines, (x, i) => array_position(lines, x) === i + lit(1))

  /** Per-document line dedup over a lines ARRAY column: returns
    * (id, n_lines, n_kept, text_clean, clean_len) with kept lines
    * re-joined by newline in page order. */
  def dedupLines(docs: DataFrame, idCol: String, lines: Column): DataFrame =
    docs.select(col(idCol), lines.as("__lines"))
      .select(col(idCol), col("__lines"), keepFirst(col("__lines")).as("__kept"))
      .select(col(idCol),
        size(col("__lines")).cast("long").as("n_lines"),
        size(col("__kept")).cast("long").as("n_kept"),
        array_join(col("__kept"), "\n").as("text_clean"))
      .withColumn("clean_len", length(col("text_clean")).cast("long"))
}
