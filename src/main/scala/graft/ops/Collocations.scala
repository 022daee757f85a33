package graft.ops

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus collocation statistics: adjacent-bigram counts scored by pointwise
  * mutual information — the phrase-mining step of a corpus pipeline (find
  * multi-word expressions worth treating as single tokens, surface corpus-
  * specific boilerplate phrases before dedup thresholds are tuned).
  *
  * Reference analog: per-topic rate/stats aggregation surfaces what flows
  * through a topic (pulsar-broker/.../stats/NonPersistentPublisherStats.java
  * aggregates); collocation stats are the corpus-content counterpart.
  *
  * '''Determinism contract.''' PMI is a log of a ratio of INTEGER counts, so
  * both engines see bit-identical operands; the score is emitted as a
  * fixed-point BIGINT (`floor(pmi·10⁶ + 0.5)`) rather than a DOUBLE so the
  * driver's exact hash compares integers, immune to float-formatting drift.
  *
  * '''Scale shape.''' Two hash aggregations (bigrams, unigrams) — both
  * map-side-combined by Spark's partial aggregation — and two key joins of
  * bigram counts against the (vocabulary-sized, corpus-scale ≪ corpus) count
  * tables; corpus totals ride in as a broadcast single-row cross join. No
  * windows, no driver state, no all-pairs.
  */
object Collocations {

  /** Adjacent bigrams with counts and fixed-point PMI, restricted to bigrams
    * seen at least `minCount` times (the standard noise floor: PMI of a
    * count-1 bigram is pure variance).
    *
    * pmi(a,b) = ln( (n_ab/B) / ((n_a/U) · (n_b/U)) )
    * with U = total unigram tokens, B = total bigram slots.
    */
  def pmiBigrams(docs: DataFrame, textCol: String,
                 minCount: Long = 5): DataFrame = {
    // bind the token array once; lambda subtrees over an unbound alias
    // re-evaluate the split per element (the winnow-window lesson)
    val toks = docs.select(tokens(col(textCol)).as("__w"))
    val pairs = toks
      .where(size(col("__w")) >= 2)
      .select(explode(transform(
        sequence(lit(1), size(col("__w")) - 1),
        i => struct(element_at(col("__w"), i).as("w1"),
                    element_at(col("__w"), i + 1).as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .where(col("w1") =!= "" && col("w2") =!= "")
    val uni = toks
      .select(explode(col("__w")).as("w")).where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("n_w"))
    val bi = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minCount)
    // B counts ALL bigram slots (including sub-minCount ones), so it comes
    // from the pair stream, not the thresholded rows
    val totals = uni.agg(sum(col("n_w")).as("u_total"))
      .crossJoin(pairs.agg(count(lit(1)).as("b_total")))
    // (n_ab/B) / ((n_a/U)·(n_b/U)) — written in exactly this op order on
    // both engines so IEEE rounding agrees step for step
    val pmi = log(
      (col("n_ab").cast("double") / col("b_total").cast("double")) /
        ((col("n_a").cast("double") / col("u_total").cast("double")) *
          (col("n_b").cast("double") / col("u_total").cast("double"))))
    bi.join(uni.select(col("w").as("w1"), col("n_w").as("n_a")), "w1")
      .join(uni.select(col("w").as("w2"), col("n_w").as("n_b")), "w2")
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("n_ab"),
        floor(pmi * lit(1000000.0) + lit(0.5)).cast("long").as("pmi_fp"))
  }
}
