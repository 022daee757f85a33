package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: replace email addresses, IPv4
  * addresses, and US-style phone numbers with typed placeholders, and count
  * what was removed (the per-category audit a curation pipeline reports).
  *
  * Pure `regexp_replace`/`regexp_count` scalar expressions — codegen'd, no
  * UDFs, no shuffle; the whole scrub rides the scan stage. The patterns
  * deliberately use the dialect-portable regex subset (no lookarounds, no
  * backrefs), so Java regex (Spark) and RE2 (DuckDB, the oracle) agree on
  * every match.
  */
object Redact {

  /** (pattern, placeholder) in application order. Email first: an address
    * can embed digit runs that the later numeric patterns would clip. */
  val rules: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{3}-\\d{3}-\\d{4}\\b" -> "<PHONE>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>")

  /** Text with every rule's matches replaced by its placeholder. */
  def redact(text: Column): Column =
    rules.foldLeft(text) { case (c, (re, ph)) => regexp_replace(c, re, ph) }

  /** Per-category counts of what [[redact]] actually replaces, in [[rules]]
    * order: each category counts on the text with the EARLIER rules already
    * applied, so a phone- or IP-shaped digit run inside an email is
    * attributed to the email that swallowed it, not double-counted. */
  def counts(text: Column): Seq[Column] =
    rules.indices.map { i =>
      val prior = rules.take(i).foldLeft(text) {
        case (c, (re, ph)) => regexp_replace(c, re, ph)
      }
      regexp_count(prior, lit(rules(i)._1))
    }
}
