package graft.ops

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier — the model-based filtering step
  * of a corpus pipeline (domain/quality classification à la fastText in
  * CCNet/FineWeb-style curation), expressed entirely as Spark aggregations:
  * training is two groupBys over the labeled split, and inference is a
  * broadcast join of the (vocabulary-sized) model against the corpus tokens.
  *
  * Reference analog: server-side entry filtering routes messages by content
  * (pulsar-broker/.../plugin/EntryFilter.java decides per entry); this is
  * the learned-model counterpart that corpus pipelines bolt on.
  *
  * '''Determinism contract.''' Log-probabilities are fixed-point BIGINTs
  * (`floor(ln(p)·10⁶ + 0.5)` — ln of a ratio of integer counts, identical
  * operands on both engines), so the per-document score is an INTEGER sum:
  * exact, associative, and independent of aggregation order. A float
  * log-likelihood sum would differ between Spark's partial aggregation tree
  * and a sequential oracle; integers cannot.
  *
  * '''Scale shape.''' Train = two map-side-combined aggregations over the
  * labeled split (token×class counts, class totals). Inference = corpus
  * token counts (one aggregation) joined against the broadcast model —
  * vocabulary × classes rows, ≪ corpus — then one integer-sum aggregation
  * per (doc, class) and an exact integer argmax (max score, then min class
  * on ties: total-ordered, no float tie ambiguity). No windows, no driver
  * state; the only corpus-sized shuffles key on (doc, token) and (doc).
  */
object NaiveBayes {

  private def fp(x: Column): Column =
    floor(x * lit(1000000.0) + lit(0.5)).cast("long")

  /** Train on `isTrain` rows (label = `labelCol`), predict for the rest.
    * Laplace smoothing with α=1 over the train vocabulary; a token unseen
    * for class c scores ln(1/(totalTokens_c + V)) — the tc=0 smoothed mass.
    * Returns (id, lang_meta = true label, pred, score_fp). */
  def classify(docs: DataFrame, idCol: String, textCol: String,
               labelCol: String, isTrain: Column): DataFrame = {
    val toks = docs
      .select(col(idCol), col(labelCol), isTrain.as("__tr"),
        explode(tokens(col(textCol))).as("t"))
      .where(col("t") =!= "")

    // --- model: token×class counts + per-class priors, all integer ---
    val tc = toks.where(col("__tr"))
      .groupBy(col(labelCol).as("c"), col("t"))
      .agg(count(lit(1)).as("tc"))
    val classTotals = tc.groupBy(col("c")).agg(sum(col("tc")).as("total_c"))
    val vocab = tc.agg(countDistinct(col("t")).as("v"))
    val nc = docs.where(isTrain)
      .groupBy(col(labelCol).as("c")).agg(count(lit(1)).as("n_c"))
    val n = docs.where(isTrain).agg(count(lit(1)).as("n"))
    val cls = nc.join(classTotals, "c").crossJoin(vocab).crossJoin(n)
      .select(col("c"),
        fp(log(col("n_c").cast("double") / col("n").cast("double")))
          .as("prior_fp"),
        fp(log(lit(1L).cast("double") /
          (col("total_c") + col("v")).cast("double"))).as("default_fp"))
    val model = tc.join(classTotals, "c").crossJoin(vocab)
      .select(col("c"), col("t"),
        fp(log((col("tc") + lit(1L)).cast("double") /
          (col("total_c") + col("v")).cast("double"))).as("lp_fp"))

    // --- inference: integer log-likelihood sum per (doc, class) ---
    val ttc = toks.where(!col("__tr"))
      .groupBy(col(idCol), col("t")).agg(count(lit(1)).as("cnt"))
    val ll = ttc
      .crossJoin(broadcast(cls.select(col("c"), col("default_fp"))))
      .join(broadcast(model), Seq("t", "c"), "left")
      .groupBy(col(idCol), col("c"))
      .agg(sum(col("cnt") * coalesce(col("lp_fp"), col("default_fp")))
        .as("ll"))
    // empty documents still score (prior only): start from the test rows
    val scored = docs.where(!isTrain).select(col(idCol))
      .crossJoin(broadcast(cls.select(col("c"), col("prior_fp"))))
      .join(ll, Seq(idCol, "c"), "left")
      .select(col(idCol), col("c"),
        (coalesce(col("ll"), lit(0L)) + col("prior_fp")).as("score_fp"))

    // exact integer argmax: max score, min class on ties
    val best = scored.groupBy(col(idCol))
      .agg(max(col("score_fp")).as("score_fp"))
    val pred = scored.join(best, Seq(idCol, "score_fp"))
      .groupBy(col(idCol), col("score_fp"))
      .agg(min(col("c")).as("pred"))
    docs.where(!isTrain)
      .select(col(idCol), col(labelCol).as("lang_meta"))
      .join(pred, idCol)
      .select(col(idCol), col("lang_meta"), col("pred"), col("score_fp"))
  }
}
