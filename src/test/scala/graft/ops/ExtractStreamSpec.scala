package graft.ops

import java.nio.file.Files

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming face of [[Extract]]: extraction is stateless scan-stage work
  * (a payload decode), so it composes into the ingest micro-batch path
  * unchanged — the union of per-batch extractions must equal the batch
  * extraction of the whole corpus, whatever the batch boundaries. */
class ExtractStreamSpec extends SparkSuite {
  import spark.implicits._

  test("streamed extraction equals batch extraction of the same corpus") {
    implicit val sqlCtx = spark.sqlContext
    val pages = (0 until 24).map { i =>
      val body = (0 until (3 + i % 5)).map(p =>
        s"<p>paragraph $p of page $i padded out with enough words to " +
          s"clear the forty character content floor easily</p>").mkString
      (i.toLong,
        s"""<header><a href="/">Site</a> <a href="/login">Login</a></header>""" +
          body + s"""<footer>(c) site $i <a href="/tos">Terms</a></footer>""")
    }
    val source = MemoryStream[(Long, String)]
    val out = Files.createTempDirectory("ext-stream-out").toFile.getAbsolutePath
    val cp = Files.createTempDirectory("ext-stream-cp").toFile.getAbsolutePath
    val q = Extract.mainContent(
        source.toDF().toDF("doc_id", "html"), "html",
        minTextLen = 40, linkNum = 1, linkDen = 2)
      .select("doc_id", "n_blocks", "n_kept", "main_text", "main_len")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .start()
    source.addData(pages.take(5): _*)
    q.processAllAvailable()
    source.addData(pages.slice(5, 17): _*)
    q.processAllAvailable()
    source.addData(pages.drop(17): _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.read.parquet(out)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String, Long)].collect().toSeq
    val batch = Extract.mainContent(pages.toDF("doc_id", "html"), "html",
        minTextLen = 40, linkNum = 1, linkDen = 2)
      .select("doc_id", "n_blocks", "n_kept", "main_text", "main_len")
      .orderBy("doc_id")
      .as[(Long, Long, Long, String, Long)].collect().toSeq
    assert(streamed == batch)
    assert(batch.forall(_._3 > 0), "every page has kept content blocks")
  }
}
