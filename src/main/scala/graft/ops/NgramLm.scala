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

  /** Adjacent-token triples (id, w1, w2, w3) — same binding discipline as
    * [[pairsOf]]. */
  private def triplesOf(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame =
    docs.select(col(idCol), tokens(col(textCol)).as("__w"))
      .where(size(col("__w")) >= 3)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("__w")) - 2),
        i => struct(element_at(col("__w"), i).as("w1"),
                    element_at(col("__w"), i + 1).as("w2"),
                    element_at(col("__w"), i + 2).as("w3")))).as("tg"))
      .select(col(idCol), col("tg.w1").as("w1"), col("tg.w2").as("w2"),
        col("tg.w3").as("w3"))
      .where(col("w1") =!= "" && col("w2") =!= "" && col("w3") =!= "")

  /** Trigram LM with Stupid Backoff (Brants et al. 2007, "Large Language
    * Models in Machine Translation") — the higher-order upgrade of
    * [[perplexityFilter]]'s slot: score each document's token TRIPLES under
    * the target slice's counts, backing off trigram → bigram → unigram with
    * a fixed α = 0.4 penalty per level (relative frequencies, not
    * normalized probabilities — Stupid Backoff's defining simplification,
    * which at corpus scale ranks as well as Kneser–Ney at a fraction of the
    * training cost):
    *
    *   S(w₃|w₁w₂) = c(w₁w₂w₃)/c(w₁w₂)            if the trigram was seen
    *              = α · c(w₂w₃)/c(w₂)            else if the bigram was
    *              = α² · c(w₃)/N                 else if the unigram was
    *              = α² · 1/N                     else (OOV)
    *
    * '''Determinism contract''' (same as the bigram face): every branch is
    * fp(ln(integer-count ratio)) plus an integer multiple of fp(ln α) —
    * per-triple BIGINTs, exact integer document sums, integer
    * cross-multiplied keep threshold. The oracle replays the identical
    * CASE cascade on the identical counts.
    *
    * '''Scale shape.''' Counts = three map-side-combined aggregations over
    * the target slice (trigram, bigram, unigram — bounded by the IN-DOMAIN
    * sample a fluency model is trained on, which is small by construction:
    * CCNet trains on a Wikipedia-sized slice, not the corpus). Scoring =
    * the corpus's triple stream against the broadcast count tables; the
    * only corpus-sized shuffle keys on the document id.
    *
    * Returns (id, n_tri, ll_fp, keep); a document with fewer than three
    * tokens has n_tri = 0 = ll and is kept. */
  def stupidBackoffFilter(docs: DataFrame, idCol: String, textCol: String,
                          isTarget: Column, thresholdMilliNat: Long,
                          alpha: Double = 0.4): DataFrame = {
    val target = docs.where(isTarget)
    val tri = triplesOf(target, idCol, textCol)
      .groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("c_abc"))
    val bi = pairsOf(target, idCol, textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
    val uni = target
      .select(explode(tokens(col(textCol))).as("w")).where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c_w"))
    val tot = uni.agg(sum(col("c_w")).as("n"))
    val aFp = fp(log(lit(alpha))) // backoff penalty, one fixed-point constant

    // a seen trigram implies its (w1,w2) prefix was counted in `bi` (same
    // slice, same adjacency, same empty-token filter), so branch 1's
    // denominator is never null
    val scored = triplesOf(docs, idCol, textCol)
      .join(broadcast(tri), Seq("w1", "w2", "w3"), "left")
      .join(broadcast(bi.select(col("w1"), col("w2"),
        col("c_ab").as("c_ctx"))), Seq("w1", "w2"), "left")
      .join(broadcast(bi.select(col("w1").as("w2"), col("w2").as("w3"),
        col("c_ab").as("c_bc"))), Seq("w2", "w3"), "left")
      .join(broadcast(uni.select(col("w").as("w2"), col("c_w").as("c_b"))),
        Seq("w2"), "left")
      .join(broadcast(uni.select(col("w").as("w3"), col("c_w").as("c_c"))),
        Seq("w3"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("lp_fp",
        when(col("c_abc").isNotNull,
          fp(log(col("c_abc").cast("double") / col("c_ctx").cast("double"))))
        .when(col("c_bc").isNotNull,
          aFp + fp(log(col("c_bc").cast("double") / col("c_b").cast("double"))))
        .when(col("c_c").isNotNull,
          lit(2L) * aFp +
            fp(log(col("c_c").cast("double") / col("n").cast("double"))))
        .otherwise(lit(2L) * aFp +
          fp(log(lit(1.0) / col("n").cast("double")))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tri"), sum(col("lp_fp")).as("ll_fp"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        coalesce(col("ll_fp"), lit(0L)).as("ll_fp"))
      .withColumn("keep",
        col("ll_fp") >= lit(thresholdMilliNat * 1000L) * col("n_tri"))
  }

  /** Interpolated Kneser–Ney trigram filter (Kneser & Ney 1995; Chen &
    * Goodman 1998) — the CONVENTIONAL fluency-filter LM, upgrading
    * [[stupidBackoffFilter]]'s relative frequencies with absolute
    * discounting (D = 0.75) and continuation-count lower orders:
    *
    *   P(w₃|w₁w₂) = max(c(w₁w₂w₃)−D, 0)/c(w₁w₂) + λ(w₁w₂)·P(w₃|w₂)
    *   λ(w₁w₂)    = D·N₁₊(w₁w₂•)/c(w₁w₂)
    *   P(w₃|w₂)   = max(N₁₊(•w₂w₃)−D, 0)/N₁₊(•w₂•) + λ(w₂)·P(w₃)
    *   λ(w₂)      = D·N₁₊(w₂•)/N₁₊(•w₂•)
    *   P(w₃)      = (N₁₊(•w₃) + 1)/(B + V)   (add-one continuation
    *                unigram — keeps OOV strictly positive; B = bigram
    *                types, V = vocabulary)
    *
    * A level whose type count is zero (context never seen as a trigram
    * prefix / w₂ never medial) falls through to the next level whole —
    * and every reachable probability is strictly positive, so ln never
    * sees zero.
    *
    * '''Determinism contract''': all counts are integers from exact
    * aggregations; each per-triple probability is ONE fixed IEEE
    * expression tree over those integers, evaluated identically by both
    * engines, then fixed-pointed (fp∘ln) and integer-summed per document
    * with the integer cross-multiplied keep threshold.
    *
    * Scale shape identical to [[stupidBackoffFilter]]: count tables
    * bounded by the in-domain slice, broadcast; one doc-id shuffle. */
  def kneserNeyFilter(docs: DataFrame, idCol: String, textCol: String,
                      isTarget: Column, thresholdMilliNat: Long): DataFrame = {
    val target = docs.where(isTarget)
    val tri = triplesOf(target, idCol, textCol)
      .groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("c_abc"))
    val bi = pairsOf(target, idCol, textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
    // type counts — tri/bi rows ARE the distinct types
    val follow2 = tri.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_f2"))
    val cont2 = tri.groupBy(col("w2"), col("w3"))
      .agg(count(lit(1)).as("n_c2"))
    val mid = tri.groupBy(col("w2")).agg(count(lit(1)).as("n_mid"))
    val follow1 = bi.groupBy(col("w1")).agg(count(lit(1)).as("n_f1"))
      .withColumnRenamed("w1", "w2")
    val cont1 = bi.groupBy(col("w2")).agg(count(lit(1)).as("n_c1"))
      .withColumnRenamed("w2", "w3")
    val btypes = bi.agg(count(lit(1)).as("b"))
    val vocab = target
      .select(explode(tokens(col(textCol))).as("w")).where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c_w"))
      .agg(count(lit(1)).as("v"))

    val d = lit(0.75)
    val scored = triplesOf(docs, idCol, textCol)
      .join(broadcast(tri), Seq("w1", "w2", "w3"), "left")
      .join(broadcast(bi.select(col("w1"), col("w2"),
        col("c_ab").as("c_ctx"))), Seq("w1", "w2"), "left")
      .join(broadcast(follow2), Seq("w1", "w2"), "left")
      .join(broadcast(cont2), Seq("w2", "w3"), "left")
      .join(broadcast(mid), Seq("w2"), "left")
      .join(broadcast(follow1), Seq("w2"), "left")
      .join(broadcast(cont1), Seq("w3"), "left")
      .crossJoin(broadcast(btypes)).crossJoin(broadcast(vocab))
      .withColumn("p3",
        (coalesce(col("n_c1"), lit(0L)).cast("double") + lit(1.0)) /
          (col("b") + col("v")).cast("double"))
      .withColumn("p2",
        when(coalesce(col("n_mid"), lit(0L)) > 0L,
          greatest(coalesce(col("n_c2"), lit(0L)).cast("double") - d,
            lit(0.0)) / col("n_mid").cast("double") +
          (d * coalesce(col("n_f1"), lit(0L)).cast("double") /
            col("n_mid").cast("double")) * col("p3"))
        .otherwise(col("p3")))
      .withColumn("p1",
        when(coalesce(col("n_f2"), lit(0L)) > 0L,
          greatest(coalesce(col("c_abc"), lit(0L)).cast("double") - d,
            lit(0.0)) / col("c_ctx").cast("double") +
          (d * col("n_f2").cast("double") /
            col("c_ctx").cast("double")) * col("p2"))
        .otherwise(col("p2")))
      .withColumn("lp_fp", fp(log(col("p1"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tri"), sum(col("lp_fp")).as("ll_fp"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        coalesce(col("ll_fp"), lit(0L)).as("ll_fp"))
      .withColumn("keep",
        col("ll_fp") >= lit(thresholdMilliNat * 1000L) * col("n_tri"))
  }

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

  /** CCNet's head/middle/tail split (Wenzek et al. 2020, arXiv:1911.00359):
    * per language, rank documents by mean negative log-likelihood under
    * the target LM and cut into `buckets` equal tertiles — head = most
    * fluent; the conventional policy keeps head+middle and drops the
    * tail. Returns one row per (lang, bucket): doc count, the bucket's
    * mnll range, and the keep verdict.
    *
    * Determinism: the ranking key is `(−ll_fp)·1000 div n_trans` — an
    * integer division of NON-NEGATIVE operands (ll_fp ≤ 0 always), so
    * truncation equals floor and both engines agree; scoreless documents
    * (no transitions) sort to the far tail via a sentinel. The ntile
    * ordering is total (key, then id). One window shuffle on the language
    * key + one aggregate — at 100 TB the per-language rank is the same
    * shape CCNet runs per shard. */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
                        langCol: String, isTarget: Column,
                        buckets: Int = 3, keepUpTo: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = perplexityFilter(docs, idCol, textCol, isTarget, 0L)
      .select(col(idCol), col("n_trans"), col("ll_fp"))
    val keyed = docs.select(col(idCol), col(langCol))
      .join(scored, Seq(idCol))
      .withColumn("mnll", when(col("n_trans") > 0,
        expr("((-ll_fp) * 1000) div n_trans"))
        .otherwise(lit(1000000000000000L)))
    val w = Window.partitionBy(col(langCol))
      .orderBy(col("mnll"), col(idCol))
    keyed.withColumn("bucket", ntile(buckets).over(w).cast("long"))
      .groupBy(col(langCol), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("mnll")).as("min_mnll"), max(col("mnll")).as("max_mnll"))
      .withColumn("keep", col("bucket") <= keepUpTo)
  }
}
