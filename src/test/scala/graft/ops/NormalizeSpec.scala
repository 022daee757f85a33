package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[Normalize]] — mojibake repair, width folds, punctuation, controls,
  * whitespace. */
class NormalizeSpec extends SparkSuite {
  import spark.implicits._

  private def norm(ss: String*): Seq[String] =
    ss.toDF("t").select(Normalize.normalize($"t")).as[String].collect().toSeq

  test("mojibake quotes and accents repair, then fold to ASCII punctuation") {
    // "CafÃ© â€œQâ€<9d>" = Café “Q” misdecoded as cp1252
    val in = "CafÃ© â€œQâ€"
    assert(norm(in) == Seq("Café \"Q\""))
  }

  test("em-dash mojibake repairs and folds; real ellipsis folds") {
    assert(norm("a â€” b") == Seq("a - b"))
    assert(norm("fin…") == Seq("fin..."))
  }

  test("full-width ASCII folds 1-to-1; exotic spaces become plain") {
    assert(norm("Ｈｉ！") == Seq("Hi!"))
    assert(norm("a b　c") == Seq("a b c"))
  }

  test("C0/C1 controls are dropped; tab/newline survive as whitespace") {
    assert(norm("badctlx") == Seq("badctlx"))
    assert(norm("a\tb\nc") == Seq("a b\nc"))
  }

  test("whitespace runs collapse; edges trim") {
    assert(norm("  a   b  ") == Seq("a b"))
    assert(norm("a \n b") == Seq("a\nb"))
  }

  test("idempotence: normalize(normalize(x)) == normalize(x)") {
    val inputs = Seq(
      "CafÃ© â€œQâ€ mixed",
      "Ｔｅｘｔ and more  spaces",
      "ctlhere â€¦ done",
      "plain ascii stays put")
    val once = norm(inputs: _*)
    val twice = once.toDF("t").select(Normalize.normalize($"t"))
      .as[String].collect().toSeq
    assert(twice == once, "a second pass must be a no-op")
  }

  test("mojibake and clean variants collapse to one string (dedup precondition)") {
    // the same sentence arriving once cp1252-damaged and once clean must
    // normalize identically, or dedup registers two documents. Mojibake
    // built from code points (the right-quote tail is C1 0x9D — invisible
    // and easily mangled as a raw literal).
    def moji(tail: Int) = "" + 0xe2.toChar + 0x20ac.toChar + tail.toChar
    val damaged = s"smart ${moji(0x153)}quotes${moji(0x9d)} and ${moji(0x201d)} dash"
    val clean =
      s"smart ${0x201c.toChar}quotes${0x201d.toChar} and ${0x2014.toChar} dash"
    val out = norm(damaged, clean)
    assert(out.head == out(1), s"variants diverged: $out")
    assert(out.head == "smart \"quotes\" and - dash")
  }

  test("normalization is scan-stage only: zero exchanges") {
    val p = Seq("x").toDF("t").select(Normalize.normalize($"t"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"unexpected shuffle:\n$p")
  }
}
