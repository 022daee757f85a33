package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Cross-corpus decontamination: exact/prefix fingerprints and near-dup
  * LSH candidates, restricted to test×train pairs. */
class DecontaminateSpec extends SparkSuite {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog near the river bank today"

  test("exact catches full-text and prefix contamination") {
    val train = Seq(
      (1L, base),
      (2L, base + " with an entirely different continuation appended here"),
      (3L, "completely unrelated training text about databases and queries")
    ).toDF("doc_id", "text")
    val test = Seq(
      (100L, base),                             // verbatim copy
      (101L, "novel evaluation text that matches nothing in training data")
    ).toDF("doc_id", "text")

    val full = Decontaminate.exact(train, test, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(full == Set((100L, 1L))) // whole-text: only the verbatim copy

    // prefix fingerprinting also catches the quoted-head case (doc 2
    // starts with the same 5 tokens)
    val prefix = Decontaminate.exact(train, test, "doc_id", "text",
      prefixTokens = 5).as[(Long, Long)].collect().toSet
    assert(prefix == Set((100L, 1L), (100L, 2L)))
  }

  test("near flags cross-corpus near-duplicates only") {
    val train = Seq(
      (1L, base),
      (2L, base), // in-corpus duplicate: must NOT appear in output
      (3L, "totally different training document with no shingles shared at all ok")
    ).toDF("doc_id", "text")
    val test = Seq(
      (100L, base + " extra"),  // near-dup of 1 and 2
      (101L, "fresh unseen evaluation document with its own unique token stream here")
    ).toDF("doc_id", "text")

    val pairs = Decontaminate.near(train, test, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((100L, 1L)) && pairs.contains((100L, 2L)))
    // only test×train pairs: no (1,2) train-dup, no test-side ids as train
    assert(pairs.forall { case (te, tr) => te >= 100L && tr < 100L })
    assert(!pairs.exists(_._1 == 101L))
  }

  test("degenerate buckets star-cap instead of going quadratic") {
    // 60 identical train docs × 40 identical test docs in one bucket:
    // full expansion would be 2400 pairs; the cap (<=1024) pairs each
    // test doc with the first train member only
    val train = (1L to 60L).map((_, base)).toDF("doc_id", "text")
    val test = (100L until 140L).map((_, base)).toDF("doc_id", "text")
    val pairs = Decontaminate.near(train, test, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(pairs.size == 40)
    assert(pairs.forall(_._2 == 1L)) // hub = smallest train id
    assert(pairs.map(_._1) == (100L until 140L).toSet) // every test doc flagged
  }

  test("embedding contamination flags cosine-close cross pairs only") {
    def row(id: Long, blk: Int, v: Seq[Double]) = (id, blk, v.map(_.toFloat))
    val train = Seq(
      row(1L, 0, Seq(1.0, 0.0, 0.0)),
      row(2L, 0, Seq(0.0, 1.0, 0.0)),
      row(3L, 1, Seq(1.0, 0.0, 0.0))) // close to test 100 but other block
      .toDF("vec_id", "label", "embedding")
    val test = Seq(
      row(100L, 0, Seq(0.9, 0.1, 0.0)), // ~train 1
      row(101L, 0, Seq(0.0, 0.0, 1.0))) // orthogonal to everything
      .toDF("vec_id", "label", "embedding")
    val got = Decontaminate.nearEmbeddings(train, test,
      "vec_id", "embedding", "label", threshold = 0.9)
      .select("test_id", "train_id").as[(Long, Long)].collect().toSet
    assert(got == Set((100L, 1L)))
  }

  test("equal ids across corpora are contamination, not self-pairs") {
    // both corpora key doc 7 (shared content-hash id scheme): the verbatim
    // overlap MUST be flagged, not dropped as a self-hit
    def row(id: Long, v: Seq[Double]) = (id, 0, v.map(_.toFloat))
    val train = Seq(row(7L, Seq(1.0, 0.0))).toDF("vec_id", "label", "embedding")
    val test = Seq(row(7L, Seq(1.0, 0.0))).toDF("vec_id", "label", "embedding")
    val got = Decontaminate.nearEmbeddings(train, test,
      "vec_id", "embedding", "label", threshold = 0.9)
      .select("test_id", "train_id").as[(Long, Long)].collect().toSet
    assert(got == Set((7L, 7L)))
  }

  test("degenerate vectors never contaminate their block") {
    def row(id: Long, v: Seq[Double]) = (id, 0, v.map(_.toFloat))
    val train = Seq(
      row(1L, Seq(0.0, 0.0)),                      // zero norm
      row(2L, Seq(Double.NaN, 1.0)),               // NaN element → NaN norm
      row(3L, Seq(Double.PositiveInfinity, 1.0)),  // Inf element → Inf norm
      row(4L, Seq(0.0, 1.0)))                      // the one real vector
      .toDF("vec_id", "label", "embedding")
    val test = Seq(row(100L, Seq(0.0, 1.0)))
      .toDF("vec_id", "label", "embedding")
    val got = Decontaminate.nearEmbeddings(train, test,
      "vec_id", "embedding", "label", threshold = 0.5)
      .select("test_id", "train_id").as[(Long, Long)].collect().toSet
    assert(got == Set((100L, 4L)),
      "zero/NaN/Inf train vectors must not flag (or mask) matches")
  }
}
