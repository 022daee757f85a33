package graft.functions

import graft.SparkSuite
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class FingerprintSpec extends SparkSuite {
  import spark.implicits._

  private def bpe(text: String): Long =
    Seq(text).toDF("text").select(bpeTokenCount(col("text")))
      .as[Long].head()

  test("BPE-ish pattern splits contractions, digits, punctuation, spaces") {
    // fragments: don | 't | ' stop' | ' 42' | ' now' | '!' = 6
    assert(bpe("don't stop 42 now!") == 6L)
    // a lone word is one fragment; appended digits split off
    assert(bpe("abc123") == 2L)
    // whitespace runs count as fragments of their own
    assert(bpe("a  b") == 3L)
    assert(bpe("") == 0L)
  }

  private def selected(text: String): Set[String] =
    Seq(text).toDF("text").select(winnowSelected(col("text")))
      .as[Seq[String]].head().toSet

  test("winnowing guarantees shared runs share a fingerprint hash") {
    // both docs embed the same 6-token run (w+k−1 = 4+3−1 = 6): winnowing
    // must select at least one common hash regardless of surroundings
    val run = "alpha beta gamma delta epsilon zeta"
    val a = selected(s"one two three $run seven eight")
    val b = selected(s"$run nine ten eleven twelve thirteen")
    assert(a.intersect(b).nonEmpty)
    // disjoint vocabularies share nothing
    val c = selected("totally different words appear here instead now friend")
    assert(a.intersect(c).isEmpty)
  }

  test("winnowing selects far fewer hashes than raw k-grams on long docs") {
    val words = (0 until 200).map(i => s"w${i % 90}").mkString(" ")
    val nGrams = Seq(words).toDF("text")
      .select(size(ngramsAll(col("text"), 3))).as[Int].head()
    val nSel = selected(words).size
    assert(nSel < nGrams / 2, s"$nSel selected of $nGrams grams")
  }

  test("short documents fingerprint their full (possibly empty) hash set") {
    assert(selected("one two") == Set.empty[String])
    val two = selected("one two three four") // 2 grams < window
    assert(two.size == 2)
    // and the digest is stable
    val fp = Seq("one two").toDF("text")
      .select(winnowFingerprint(col("text"))).as[String].head()
    assert(fp == java.security.MessageDigest.getInstance("MD5")
      .digest("".getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }
}
