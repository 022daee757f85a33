package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Code-vs-prose routing — the pretraining data router that decides
  * whether a document flows to the code pipeline (different dedup
  * granularity, different quality rules, different tokenizer budget) or
  * the text pipeline. Two integer density signals, both scan-stage:
  *
  *  - '''symbol density''': characters from [[symbolChars]] per document
  *    char (counted arithmetically via `translate`, the
  *    [[graft.functions.TextFunctions.tokenCount]] trick);
  *  - '''keyword density''': whole tokens from [[keywords]] per token.
  *
  * The verdict is an OR of two integer cross-multiplies (`cnt·100 ≥
  * total·pct`) — no float ratio, so the routing decision replays exactly
  * in the oracle and never flips under re-partitioning.
  *
  * Reference analog: protocol-based message routing at the edge
  * (pulsar-client/.../RoundRobinPartitionMessageRouterImpl.java) — an
  * O(payload) classification deciding which downstream pipeline sees
  * the record.
  */
object CodeDetect {

  /** Whole-token code keywords (language-agnostic core). */
  val keywords: Seq[String] = Seq("def", "return", "class", "import",
    "function", "var", "const", "void", "elif")

  /** Code punctuation alphabet for the symbol-density count. */
  val symbolChars: String = "{}();=<>[]"

  /** Characters of `t` drawn from [[symbolChars]]. */
  def codeCharCount(t: Column): Column =
    (length(t) - length(translate(t, symbolChars, ""))).cast("long")

  /** Whole tokens of `t` that are code [[keywords]]. */
  def codeTokenCount(t: Column): Column =
    size(filter(split(t, " "), x => x.isInCollection(keywords)))
      .cast("long")

  /** Appends (n_code_chars, n_code_tokens, is_code) to `docs`:
    * `is_code` iff symbol density ≥ charPct% OR keyword density ≥
    * tokPct%. Pure projection — zero shuffle. */
  def withVerdict(docs: DataFrame, textCol: String,
                  charPct: Long, tokPct: Long): DataFrame = {
    val t = col(textCol)
    val nChars = length(t).cast("long")
    val nToks =
      (length(t) - length(translate(t, " ", "")) + 1).cast("long")
    docs
      .withColumn("n_code_chars", codeCharCount(t))
      .withColumn("n_code_tokens", codeTokenCount(t))
      .withColumn("is_code",
        col("n_code_chars") * 100L >= nChars * charPct ||
          col("n_code_tokens") * 100L >= nToks * tokPct)
  }
}
