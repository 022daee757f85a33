package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[LineDedup]] — keep-first within one document, order preserved. */
class LineDedupSpec extends SparkSuite {
  import spark.implicits._

  test("repeated lines drop, first occurrences keep their order") {
    val docs = Seq(
      (1L, Seq("cookie banner", "real content one", "cookie banner",
        "real content two", "real content one")),
      (2L, Seq("only", "unique", "lines")),
      (3L, Seq.empty[String]))
      .toDF("doc_id", "lines")
    val out = LineDedup.dedupLines(docs, "doc_id", col("lines"))
      .orderBy("doc_id")
      .select("doc_id", "n_lines", "n_kept", "text_clean")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 5L, 3L, "cookie banner\nreal content one\nreal content two"),
      (2L, 3L, 3L, "only\nunique\nlines"),
      (3L, 0L, 0L, "")))
  }

  test("composes with ParagraphDedup: intra-page first, cross-doc after") {
    // two pages sharing a unit, one also repeating it internally — the
    // intra-page pass collapses the internal repeat so the corpus-wide
    // keeper election sees each page's unit once
    val docs = Seq(
      (1L, Seq("shared unit", "shared unit", "own one")),
      (2L, Seq("shared unit", "own two")))
      .toDF("doc_id", "lines")
    val clean = LineDedup.dedupLines(docs, "doc_id", col("lines"))
    val counts = clean.select(explode(split(col("text_clean"), "\n")).as("u"))
      .groupBy("u").count().as[(String, Long)].collect().toMap
    assert(counts("shared unit") == 2L,
      "after the intra-page pass each page contributes the unit exactly once")
  }
}
