package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composed quality-filter cascade — the decision surface a corpus build
  * actually runs before anything expensive (dedup, tokenization): several
  * independent keep/drop rules evaluated in ONE scan, a per-document
  * failure BITMASK so attrition is auditable per rule (a pipeline that
  * only logs the final keep count cannot answer "which rule ate my
  * corpus"), and the attrition report itself as a single map-side-combined
  * aggregate.
  *
  * Scale shape: `decide` is pure scan-stage expression work — rules are
  * scalar Columns (the [[GopherQuality.keepExpr]] /
  * [[Blocklist.matchCount]] / [[graft.functions.TextFunctions.langId]]
  * family), the mask is a when-fold, nothing joins or shuffles at any
  * corpus size. `attrition` is one aggregate over the decision frame.
  *
  * Reference analog: the broker runs a CHAIN of entry filters per message
  * and the dispatcher acts on the combined verdict
  * (pulsar-broker/.../plugin/EntryFilterProvider.java — filters compose,
  * each can reject); the bitmask is that chain's per-rule audit trail. */
object FilterCascade {

  /** [[decide]]'s mask appended IN PLACE (`fail_mask`, `keep` columns on
    * the full frame): the form a pipeline stage composes with — filtering
    * on `keep` right here costs nothing, where decide-then-join-back would
    * shuffle the corpus against its own verdicts. */
  def withVerdict(docs: DataFrame,
                  rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty && rules.size <= 62, s"bad rule count ${rules.size}")
    val mask = rules.zipWithIndex.map { case ((_, pred), i) =>
      when(pred, 0L).otherwise(lit(1L << i))
    }.reduce(_ + _) // bits are disjoint, so + is |
    docs.withColumn("fail_mask", mask)
      .withColumn("keep", col("fail_mask") === 0L)
  }

  /** Per-document verdict: (id, fail_mask, keep). Bit i of `fail_mask` is
    * set iff rule i FAILED (rules are (name, keep-predicate) pairs in
    * mask-bit order); `keep` = no bit set. A null predicate (undefined
    * stat) counts as a failure — a rule that cannot evaluate must not
    * silently admit the document. */
  def decide(docs: DataFrame, idCol: String,
             rules: Seq[(String, Column)]): DataFrame =
    withVerdict(docs, rules)
      .select(col(idCol), col("fail_mask"), col("keep"))

  /** The attrition report: one row — total docs, per-rule failure counts
    * (overlapping: a doc failing two rules counts in both), and survivors.
    * `ruleNames` must be the same names in the same order as `decide`'s
    * rules. */
  def attrition(decided: DataFrame, ruleNames: Seq[String]): DataFrame = {
    val perRule = ruleNames.zipWithIndex.map { case (n, i) =>
      sum(when(col("fail_mask").bitwiseAND(lit(1L << i)) =!= 0L, 1L)
        .otherwise(0L)).as(s"fail_$n")
    }
    decided.agg(count(lit(1)).as("n_docs"),
      perRule :+ sum(when(col("fail_mask") === 0L, 1L).otherwise(0L))
        .as("n_keep"): _*)
  }
}
