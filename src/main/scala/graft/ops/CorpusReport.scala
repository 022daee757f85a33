package graft.ops

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus data card — the per-slice statistics sheet published with a
  * training dataset (the "Datasheets for Datasets" habit): document and
  * token counts, char mass, size extremes, and the quality pass rate, per
  * grouping dimension (source, language, split, ...). The first artifact a
  * pipeline owner reads after a build, and the one diffable across builds.
  *
  * Reference analog: per-topic stats aggregation (pulsar-broker/.../
  * PersistentTopicsStats via admin `topics stats`) — counts/rates rolled up
  * per entity and exposed as the operational dashboard; the data card is
  * the corpus-build instance.
  *
  * Everything is an integer count or sum over per-document scalars, so the
  * report is bit-exact on any engine. Scale shape: per-document statistics
  * are scalar folds in the scan stage ([[GopherQuality]] does the rule
  * work), the rollup is ONE map-side-combined aggregation on the dimension
  * key — at 100 TB, a single pass and a dimensions-sized result.
  */
object CorpusReport {

  /** One row per value of `dimCol`: n_docs, n_tokens, n_chars_total,
    * min/max chars, n_quality_pass ([[GopherQuality]] keep verdicts with
    * the supplied thresholds). */
  def dataCard(docs: DataFrame, idCol: String, textCol: String,
               charsCol: String, dimCol: String,
               minWords: Long = 50L, maxMeanLen: Long = 10L,
               maxDupNum: Long = 3L, maxDupDen: Long = 10L): DataFrame = {
    val quality = GopherQuality.battery(docs, idCol, textCol,
      minWords = minWords, maxMeanLen = maxMeanLen,
      maxDupNum = maxDupNum, maxDupDen = maxDupDen)
      .select(col(idCol), col("keep"))
    docs
      .select(col(idCol), col(dimCol), col(charsCol),
        size(filter(tokens(col(textCol)), t => t =!= "")).cast("long")
          .as("__ntok"))
      .join(quality, Seq(idCol))
      .groupBy(col(dimCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__ntok")).as("n_tokens"),
        sum(col(charsCol)).as("n_chars_total"),
        min(col(charsCol)).as("min_chars"),
        max(col(charsCol)).as("max_chars"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_quality_pass"))
  }
}
