package graft.ops

import java.nio.file.Files

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming face of [[ContentChunk]]: each document is one row, so the
  * per-doc boundary window never spans micro-batches — the union of
  * per-batch chunk tables must equal the batch chunking of the whole
  * corpus, whatever the batch boundaries. */
class ContentChunkStreamSpec extends SparkSuite {
  import spark.implicits._

  test("streamed chunking equals batch chunking of the same corpus") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(5)
    val docs = (0 until 18).map(i =>
      (i.toLong, Seq.fill(60)(s"w${rnd.nextInt(900)}").mkString(" ")))
    val source = MemoryStream[(Long, String)]
    val out = Files.createTempDirectory("cc-stream-out").toFile.getAbsolutePath
    val cp = Files.createTempDirectory("cc-stream-cp").toFile.getAbsolutePath
    val q = source.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch {
        (b: org.apache.spark.sql.DataFrame, _: Long) =>
          ContentChunk.chunks(b, "doc_id", "text", div = 8)
            .write.mode("append").parquet(out)
      }
      .option("checkpointLocation", cp)
      .start()
    source.addData(docs.take(7): _*)
    q.processAllAvailable()
    source.addData(docs.drop(7): _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.read.parquet(out)
      .orderBy("doc_id", "chunk_idx").collect().toSeq
    val batch = ContentChunk.chunks(docs.toDF("doc_id", "text"),
        "doc_id", "text", div = 8)
      .orderBy("doc_id", "chunk_idx").collect().toSeq
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}
