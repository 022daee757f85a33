package graft.ops

import java.nio.file.Files

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming face of [[RagChunk]]: chunking is stateless scan-stage work,
  * so it composes into the ingest micro-batch path unchanged — each
  * micro-batch's chunks must equal the batch chunking of the same rows,
  * and the union across batches must equal chunking the whole corpus
  * (chunk ids are per-document, so batch boundaries cannot shift them). */
class RagChunkStreamSpec extends SparkSuite {
  import spark.implicits._

  test("streamed chunking equals batch chunking of the same corpus") {
    implicit val sqlCtx = spark.sqlContext
    val docs = (0 until 30).map { i =>
      (i.toLong, (0 until (5 + i * 3 % 40)).map(t => s"t$t").mkString(" "))
    }
    val source = MemoryStream[(Long, String)]
    val out = Files.createTempDirectory("rag-stream-out").toFile.getAbsolutePath
    val cp = Files.createTempDirectory("rag-stream-cp").toFile.getAbsolutePath
    val q = RagChunk.chunks(
        source.toDF().toDF("doc_id", "text"), "doc_id", "text",
        window = 16, stride = 12)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .start()
    // three uneven micro-batches
    source.addData(docs.take(7): _*)
    q.processAllAvailable()
    source.addData(docs.slice(7, 20): _*)
    q.processAllAvailable()
    source.addData(docs.drop(20): _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.read.parquet(out)
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_idx", "start_tok", "n_tok", "chunk_text")
      .as[(Long, Long, Long, Int, String)].collect().toSeq
    val batch = RagChunk.chunks(docs.toDF("doc_id", "text"),
        "doc_id", "text", window = 16, stride = 12)
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_idx", "start_tok", "n_tok", "chunk_text")
      .as[(Long, Long, Long, Int, String)].collect().toSeq
    assert(streamed == batch)
  }
}
