package graft.ops

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram language-model perplexity filtering — the CCNet/KenLM slot of a
  * corpus pipeline: train a small LM on an in-domain target slice, score
  * every document by how probable its token transitions are under that
  * model, and keep documents above a fluency threshold (garbled or
  * boilerplate text scores low).
  *
  * Model: Laplace-smoothed bigram LM over the target slice's tokens.
  * P(b|a) = (c(a,b)+1)/(c(a)+V), with V the target unigram vocabulary; a
  * transition from an unseen context scores 1/V — every probability is a
  * ratio of integer counts.
  *
  * '''Determinism contract.''' Per-transition log-probabilities are
  * fixed-point BIGINTs; a document's log-likelihood is their exact integer
  * sum. The keep decision compares ll_fp ≥ τ_fp·n_trans (threshold per
  * transition, cross-multiplied) — pure integer arithmetic, no float
  * average, so the oracle reproduces every row bit-for-bit.
  *
  * '''Scale shape.''' Training = two map-side-combined aggregations over
  * the target slice (bigram, unigram counts — vocabulary²-bounded ≪
  * corpus). Scoring = the corpus's adjacent-pair stream joined against the
  * broadcast model, then one integer-sum aggregation per document. The
  * only corpus-sized shuffle keys on the document id.
  */
object NgramLm {

  private def fp(x: Column): Column =
    floor(x * lit(1000000.0) + lit(0.5)).cast("long")

  /** Adjacent-token pairs (id, w1, w2) — binds the token array before the
    * lambda so the split is evaluated once (the winnow-window lesson). */
  private def pairsOf(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    docs.select(col(idCol), tokens(col(textCol)).as("__w"))
      .where(size(col("__w")) >= 2)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("__w")) - 1),
        i => struct(element_at(col("__w"), i).as("w1"),
                    element_at(col("__w"), i + 1).as("w2")))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .where(col("w1") =!= "" && col("w2") =!= "")

  /** Score every document: (id, n_trans, ll_fp, keep). `thresholdMilliNat`
    * is the per-transition threshold in milli-nats (e.g. -3500 keeps docs
    * whose mean transition log-prob exceeds −3.5); a document with no
    * transitions has ll_fp = 0 = τ·0 and is kept. */
  def perplexityFilter(docs: DataFrame, idCol: String, textCol: String,
                       isTarget: Column,
                       thresholdMilliNat: Long): DataFrame = {
    val target = docs.where(isTarget)
    val tPairs = pairsOf(target, idCol, textCol)
    val bi = tPairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_ab"))
    val uni = target
      .select(explode(tokens(col(textCol))).as("w")).where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c_a"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    // per-context transition probs + per-context unseen-transition default;
    // ln of integer-count ratios, identical operands on both engines
    val model = bi.join(uni.select(col("w").as("w1"), col("c_a")), "w1")
      .crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"),
        fp(log((col("c_ab") + lit(1L)).cast("double") /
          (col("c_a") + col("v")).cast("double"))).as("lp_fp"))
    val ctxDefault = uni.select(col("w").as("w1"), col("c_a"))
      .crossJoin(broadcast(vocab))
      .select(col("w1"), fp(log(lit(1L).cast("double") /
        (col("c_a") + col("v")).cast("double"))).as("ctx_fp"))
    // entirely-unseen context: c(a)=0 → ln(1/V)
    val global = vocab.select(fp(log(lit(1L).cast("double") /
      col("v").cast("double"))).as("glob_fp"))

    val scored = pairsOf(docs, idCol, textCol)
      .join(broadcast(model), Seq("w1", "w2"), "left")
      .join(broadcast(ctxDefault), Seq("w1"), "left")
      .crossJoin(broadcast(global))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trans"),
        sum(coalesce(col("lp_fp"), col("ctx_fp"), col("glob_fp")))
          .as("ll_fp"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_trans"), lit(0L)).as("n_trans"),
        coalesce(col("ll_fp"), lit(0L)).as("ll_fp"))
      .withColumn("keep",
        // τ in milli-nats → fixed-point: ×1000; integer cross-multiply
        col("ll_fp") >= lit(thresholdMilliNat * 1000L) * col("n_trans"))
  }
}
