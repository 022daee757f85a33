package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gopher-style quality-rule battery (Rae et al. 2021, "Scaling Language
  * Models: Methods, Analysis & Insights from Training Gopher", public arXiv
  * 2112.11446, Appendix A1.1): the standard pre-filter a web corpus passes
  * before dedup — word-count bounds, mean-word-length bounds, a duplicate-
  * token ceiling, and a minimum stop-word presence. Each rule is emitted as
  * its own boolean column (so a pipeline can audit WHY a document fell),
  * `keep` is their conjunction.
  *
  * Reference analog: server-side entry filters accept/reject each message
  * before dispatch (pulsar-broker/.../plugin/EntryFilter.java); this is the
  * corpus-quality instance of that gate, evaluated in the scan stage.
  *
  * '''Determinism contract.''' Every ratio rule is an integer
  * cross-multiply over per-document token statistics (counts and length
  * sums — no division, no floats), so both engines agree bit-for-bit.
  *
  * Scale shape: all statistics are scalar array folds over the token list —
  * NO explode, NO shuffle; the whole battery runs inside the scan stage's
  * whole-stage codegen like the repetition signals in
  * [[graft.functions.TextFunctions]].
  */
object GopherQuality {

  /** The stop-word set for the presence rule — Gopher uses common English
    * function words; callers substitute per-language lists. */
  val DefaultStopwords: Seq[String] = Seq("the", "a", "of", "to", "and")

  /** The whole battery verdict as ONE scalar Column — for composing into a
    * filter cascade ([[FilterCascade]]) without a join or a second scan.
    * Identical to `battery(...)("keep")` for every document (spec-checked
    * so the two formulations cannot drift). */
  def keepExpr(text: org.apache.spark.sql.Column,
               minWords: Long = 50L, maxWords: Long = 100000L,
               minMeanLen: Long = 3L, maxMeanLen: Long = 10L,
               maxDupNum: Long = 3L, maxDupDen: Long = 10L,
               stopwords: Seq[String] = DefaultStopwords,
               minStopHits: Long = 2L): org.apache.spark.sql.Column = {
    val toks = filter(split(text, " "), t => t =!= "")
    val nW = size(toks).cast("long")
    val sumL = aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
    val nD = size(array_distinct(toks)).cast("long")
    val hits = size(array_intersect(array_distinct(toks),
      array(stopwords.map(lit): _*))).cast("long")
    (nW >= minWords && nW <= maxWords) &&
      (lit(minMeanLen) * nW <= sumL && sumL <= lit(maxMeanLen) * nW) &&
      ((nW - nD) * maxDupDen <= lit(maxDupNum) * nW) &&
      (hits >= minStopHits)
  }

  /** Per-document rule battery. Ratio thresholds arrive as rationals
    * (`maxDupNum/maxDupDen` is the duplicate-token ceiling) so the
    * comparison stays in integers. Returns (id, n_words, sum_word_len,
    * n_distinct, stop_hits, words_ok, wlen_ok, dup_ok, stop_ok, keep). */
  def battery(docs: DataFrame, idCol: String, textCol: String,
              minWords: Long = 50L, maxWords: Long = 100000L,
              minMeanLen: Long = 3L, maxMeanLen: Long = 10L,
              maxDupNum: Long = 3L, maxDupDen: Long = 10L,
              stopwords: Seq[String] = DefaultStopwords,
              minStopHits: Long = 2L): DataFrame = {
    val toks = filter(split(col(textCol), " "), t => t =!= "")
    val nW = size(toks).cast("long")
    val sumL = aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
    val nD = size(array_distinct(toks)).cast("long")
    val hits = size(array_intersect(array_distinct(toks),
      array(stopwords.map(lit): _*))).cast("long")
    docs
      .select(col(idCol), nW.as("n_words"), sumL.as("sum_word_len"),
        nD.as("n_distinct"), hits.as("stop_hits"))
      .withColumn("words_ok",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      // min ≤ sum/n ≤ max as cross-multiplies (n > 0 on every fixture row;
      // an empty doc fails words_ok and keep regardless)
      .withColumn("wlen_ok",
        lit(minMeanLen) * col("n_words") <= col("sum_word_len") &&
          col("sum_word_len") <= lit(maxMeanLen) * col("n_words"))
      // duplicate-token fraction (n−distinct)/n ≤ num/den
      .withColumn("dup_ok",
        (col("n_words") - col("n_distinct")) * maxDupDen <=
          lit(maxDupNum) * col("n_words"))
      .withColumn("stop_ok", col("stop_hits") >= minStopHits)
      .withColumn("keep",
        col("words_ok") && col("wlen_ok") && col("dup_ok") && col("stop_ok"))
  }
}
