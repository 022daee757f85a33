package graft.functions

import graft.SparkSuite
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("tokenCount counts space-separated tokens") {
    val df = Seq("one two three", "solo", "a b c d").toDF("text")
    assert(df.select(tokenCount(col("text"))).as[Long].collect().toSeq ==
      Seq(3L, 1L, 4L))
  }

  test("shingles produces k-grams; short docs yield empty array") {
    val df = Seq("a b c d", "a b", "x y z").toDF("text")
    val out = df.select(shingles(col("text"), 3)).as[Seq[String]].collect()
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1).isEmpty)
    assert(out(2) == Seq("x y z"))
  }

  test("shingles deduplicates repeated k-grams") {
    val df = Seq("a b a b a b").toDF("text")
    val out = df.select(shingles(col("text"), 2)).as[Seq[String]].collect()
    assert(out(0).toSet == Set("a b", "b a"))
    assert(out(0).length == 2)
  }

  test("fingerprint normalizes whitespace and case") {
    val df = Seq(("  Hello   World ", "hello world")).toDF("a", "b")
    val r = df.select(fingerprint(col("a")) === fingerprint(col("b")))
      .as[Boolean].collect()
    assert(r.head)
  }

  test("hash16 is within 16 bits and matches a JVM md5 reimplementation") {
    val words = Seq("spark", "join", "the", "data")
    val got = words.toDF("w").select(hash16(col("w"))).as[Int].collect()
    val expected = words.map { w =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).take(2).map("%02x".format(_)).mkString
      Integer.parseInt(hex, 16)
    }
    assert(got.toSeq == expected)
    assert(got.forall(h => h >= 0 && h < 65536))
  }

  test("langId picks the language with most stopword hits, 'und' if none") {
    val df = Seq(
      "the cat and the dog of the house",
      "el perro de la casa que los gatos",
      "xyzzy qwerty").toDF("text")
    assert(df.select(langId(col("text"))).as[String].collect().toSeq ==
      Seq("en", "es", "und"))
  }

  test("wordOccurrences counts adjacent repeated tokens exactly") {
    val df = Seq("the the the", "the cat the", "nothing here", "the")
      .toDF("text")
    val n = df.select(TextFunctions.wordOccurrences(col("text"), "the"))
      .as[Long].collect().toSeq
    assert(n == Seq(3L, 2L, 0L, 1L)) // pad-and-replace undercounted "the the the"
  }

  test("fused MinHashSignature matches the compositional form on EMPTY shingle sets") {
    val df = Seq("a b").toDF("text") // < k tokens → zero shingles
    val sh = TextFunctions.shingles(col("text"), 3)
    val fused = df.select(graft.functions.GraftExpressions
      .minhash_signature(sh, 4)).collect().head.getSeq[String](0)
    val composed = df.select(TextFunctions.minhashSignature(sh, 4))
      .collect().head.getSeq[String](0)
    assert(fused == composed) // both: [null, null, null, null]
    assert(fused.size == 4 && fused.forall(_ == null))
  }

  test("qualityScore is bounded in [0,1]") {
    val df = Seq("the quick brown fox jumps over the lazy dog",
      "a", ("word " * 200).trim).toDF("text")
    val scores = df.select(qualityScore(col("text"))).as[Double].collect()
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("fused MinHashSignature expression equals compositional min(md5(...))") {
    val df = Seq("a b c d e f g", "join the spark data table now")
      .toDF("text").withColumn("sh", shingles(col("text"), 3))
    val fused = df.select(GraftExpressions.minhash_signature(col("sh"), 8))
      .as[Seq[String]].collect()
    val composed = df.select(minhashSignature(col("sh"), 8))
      .as[Seq[String]].collect()
    assert(fused.toSeq == composed.toSeq)
  }

  test("sorted_intersect_count equals array_intersect size on sorted arrays") {
    val df = Seq((Seq(1L, 3L, 5L, 9L), Seq(3L, 4L, 5L, 10L)),
      (Seq(1L, 2L), Seq(3L, 4L)), (Seq.empty[Long], Seq(1L)))
      .toDF("a", "b")
    val fast = df.select(GraftExpressions.sorted_intersect_count(col("a"),
      col("b"))).as[Int].collect().toSeq
    val ref = df.select(size(array_intersect(col("a"), col("b"))))
      .as[Int].collect().toSeq
    assert(fast == ref && fast == Seq(2, 0, 0))
  }

  test("minhash: identical shingle sets give identical signatures") {
    val df = Seq("a b c d e", "a b c d e", "v w x y z").toDF("text")
      .withColumn("sh", shingles(col("text"), 3))
    val sigs = df.select(minhashSignature(col("sh"), 8)).as[Seq[String]]
      .collect()
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
  }
}
