package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Within-document word-entropy — the cheap gibberish/repetition signal
  * between Gopher's dup-token ceiling and a full LM: a document whose
  * token distribution has abnormally LOW entropy is template spam
  * ("buy now buy now …"); abnormally HIGH entropy at short length is
  * random-character noise. Used as a cascade rule input alongside
  * [[GopherQuality]].
  *
  * '''Integer-exact discipline''' (the [[NgramLm]] fixed-point pattern):
  * the only irrational step, `ln`, is snapped ONCE per count to
  * `lnfp(c) = floor(ln(c)·10⁶ + 0.5)` — identical in Java and DuckDB —
  * and everything after is integer arithmetic: the n-scaled entropy
  * `n·H ≈ n·lnfp(n) − Σ_w c_w·lnfp(c_w)` (micro-nats × n). No float
  * accumulation, so distributed sums are order-independent and the
  * oracle replays every value bit-for-bit.
  *
  * '''Scale shape.''' One explode over tokens, one (doc, word) count
  * (map-side combined), one per-doc rollup — the same two-aggregate
  * cascade every word-statistics pass costs. Payload strings never
  * shuffle beyond the token stream.
  */
object Entropy {

  /** floor(ln(x)·10⁶ + 0.5) as a column (x a positive integer column). */
  private def lnFp(x: org.apache.spark.sql.Column) =
    floor(log(x.cast("double")) * 1000000.0 + 0.5).cast("long")

  /** Per-document (n_tokens, n_distinct, ent_n_fp): `ent_n_fp` is the
    * n-scaled entropy in micro-nats — divide by n for mean nats/token;
    * 0 for single-token and empty documents. */
  def wordEntropy(docs: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
        explode(filter(split(col(textCol), " "), t => t =!= "")).as("__w"))
    val counts = toks.groupBy(col(idCol), col("__w"))
      .agg(count(lit(1)).as("c"))
    counts.groupBy(col(idCol))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("c") * lnFp(col("c"))).as("__clnc"))
      .withColumn("ent_n_fp",
        col("n_tokens") * lnFp(col("n_tokens")) - col("__clnc"))
      .drop("__clnc")
  }
}
