package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text normalization — the ftfy/NFKC slot of a web-corpus pipeline, run
  * between HTML extraction and quality filtering: repair the most common
  * mojibake (UTF-8 bytes once misdecoded as cp1252 — "â€™"
  * for an apostrophe), fold full-width ASCII and exotic spaces to their
  * ASCII forms, normalize typographic punctuation, strip control
  * characters, and collapse horizontal whitespace runs. Left unfixed,
  * every one of these splits token statistics (the same word counts
  * twice), breaks exact/fingerprint dedup, and poisons n-gram models
  * downstream.
  *
  * '''Determinism contract.''' The rule set is DATA ([[mojibakeRules]],
  * [[punctRules]], [[widthFrom]]/[[widthTo]], [[controlClass]]) and the
  * pipeline is a fixed fold of `replace`/`translate`/`regexp_replace`
  * over it — scan-stage expressions only, zero shuffle — and the DuckDB
  * oracle is GENERATED from the same tables ([[normalizeSql]]), so both
  * engines apply byte-identical rewrites in the same order. Ordering:
  * mojibake repair first (no rule's search key is a prefix of another's,
  * so fold order cannot mis-split), then width folds, then punctuation
  * (a repaired right-quote then folds to ASCII), then control strip
  * (the C1 tail of an unrepaired sequence must not be pre-stripped),
  * then whitespace collapse.
  *
  * Reference analog: payload normalization at the consume edge —
  * de-batch/de-chunk/schema-decode before the app sees the record
  * (pulsar-client/.../impl/ConsumerImpl.java:1365+); normalization is
  * that decode step for text bytes.
  */
object Normalize {

  /** cp1252-misdecoded UTF-8 sequences → the intended character.
    * UTF-8 bytes E2 80 xx (General Punctuation) re-read as cp1252 yield
    * "â€" + one distinguishing char; C3 xx (Latin-1 letters)
    * yield "Ã" + one char. Every search key ends in a distinct
    * char and none is a prefix of another. */
  val mojibakeRules: Seq[(String, String)] = Seq(
    "â€™" -> "’", // right single quote
    "â€œ" -> "“", // left double quote
    "â€" -> "”", // right double quote (C1 tail)
    "â€˜" -> "‘", // left single quote
    "â€“" -> "–", // en dash
    "â€”" -> "—", // em dash
    "â€¦" -> "…", // ellipsis
    "Ã©" -> "é",       // e acute
    "Ã¨" -> "è",       // e grave
    "Ã¼" -> "ü",       // u umlaut
    "Ã¶" -> "ö",       // o umlaut
    "Ã¤" -> "ä",       // a umlaut
    "Ã±" -> "ñ")       // n tilde

  /** Typographic punctuation → ASCII (applied AFTER mojibake repair so
    * repaired smart quotes fold too). Multi-char targets allowed. */
  val punctRules: Seq[(String, String)] = Seq(
    "‘" -> "'", "’" -> "'",
    "“" -> "\"", "”" -> "\"",
    "–" -> "-", "—" -> "-",
    "…" -> "...")

  /** 1-to-1 width folds: full-width ASCII U+FF01–U+FF5E → U+21–U+7E,
    * ideographic space (U+3000) and NBSP (U+00A0) → plain space. */
  val widthFrom: String =
    (0xFF01 to 0xFF5E).map(_.toChar).mkString + "　 "
  val widthTo: String =
    (0x21 to 0x7E).map(_.toChar).mkString + "  "

  /** C0 (minus \t \n \r) + DEL + C1 — dropped outright. \x{..} class
    * syntax is valid in both Java regex and RE2. */
  val controlClass: String =
    "[\\x{00}-\\x{08}\\x{0B}\\x{0C}\\x{0E}-\\x{1F}\\x{7F}-\\x{9F}]"

  /** The full normalization chain over a string column. */
  def normalize(t: Column): Column = {
    val repaired = mojibakeRules.foldLeft(t) { case (c, (from, to)) =>
      replace(c, lit(from), lit(to)) }
    val folded = translate(repaired, widthFrom, widthTo)
    val punct = punctRules.foldLeft(folded) { case (c, (from, to)) =>
      replace(c, lit(from), lit(to)) }
    val noCtl = regexp_replace(punct, controlClass, "")
    val ws = regexp_replace(
      regexp_replace(noCtl, "[ \\t]+", " "), " ?\\n ?", "\n")
    trim(ws)
  }

  /** A Scala string as a DuckDB expression: printable ASCII inline
    * (quotes doubled), every other char as `chr(n)` — immune to encoding
    * drift through the oracle_sql.json round-trip. */
  def sqlLit(s: String): String = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val run = new StringBuilder
    def flush(): Unit = if (run.nonEmpty) {
      parts += s"'${run.toString.replace("'", "''")}'"; run.clear()
    }
    s.foreach { ch =>
      if (ch >= ' ' && ch <= '~') run.append(ch)
      else { flush(); parts += s"chr(${ch.toInt})" }
    }
    flush()
    if (parts.isEmpty) "''" else parts.mkString(" || ")
  }

  /** The same chain rendered as DuckDB SQL over expression `e` — built
    * from the SAME rule tables, so oracle and engine cannot drift.
    * Non-ASCII rule literals render via [[sqlLit]]; DuckDB standard
    * strings pass backslashes through to RE2 verbatim. */
  def normalizeSql(e: String): String = {
    val repaired = mojibakeRules.foldLeft(e) { case (s, (from, to)) =>
      s"replace($s, ${sqlLit(from)}, ${sqlLit(to)})" }
    val folded =
      s"translate($repaired, ${sqlLit(widthFrom)}, ${sqlLit(widthTo)})"
    val punct = punctRules.foldLeft(folded) { case (s, (from, to)) =>
      s"replace($s, ${sqlLit(from)}, ${sqlLit(to)})" }
    val noCtl = s"regexp_replace($punct, '$controlClass', '', 'g')"
    val ws = s"regexp_replace(regexp_replace($noCtl, '[ \\t]+', ' ', 'g')," +
      s" ' ?\\n ?', chr(10), 'g')"
    s"trim($ws)"
  }
}
