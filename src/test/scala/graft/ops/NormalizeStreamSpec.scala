package graft.ops

import java.nio.file.Files

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming face of [[Normalize]]: normalization is stateless scan-stage
  * work, so the union of per-batch normalizations must equal the batch
  * normalization of the whole corpus, whatever the batch boundaries —
  * the property that makes it safe as an ingest stage ahead of the
  * dedup fingerprints (StreamBench curate wiring). */
class NormalizeStreamSpec extends SparkSuite {
  import spark.implicits._

  test("streamed normalization equals batch normalization of the same corpus") {
    implicit val sqlCtx = spark.sqlContext
    def moji(tail: Int) = "" + 0xe2.toChar + 0x20ac.toChar + tail.toChar
    val docs = (0 until 21).map { i =>
      val mess = i % 4 match {
        case 0 => s"doc $i with ${moji(0x2122)}quoted${moji(0x9d)} bits"
        case 1 => s"doc $i ${0xff28.toChar}${0xff49.toChar} full width"
        case 2 => s"doc $i has${0x7.toChar} controls${0x9f.toChar} inside"
        case _ => s"doc $i plain  with   runs"
      }
      (i.toLong, mess)
    }
    val source = MemoryStream[(Long, String)]
    val out = Files.createTempDirectory("norm-stream-out").toFile.getAbsolutePath
    val cp = Files.createTempDirectory("norm-stream-cp").toFile.getAbsolutePath
    val q = source.toDF().toDF("doc_id", "text")
      .select($"doc_id", Normalize.normalize($"text").as("clean"))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .start()
    source.addData(docs.take(8): _*)
    q.processAllAvailable()
    source.addData(docs.drop(8): _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.read.parquet(out).orderBy("doc_id")
      .as[(Long, String)].collect().toSeq
    val batch = docs.toDF("doc_id", "text")
      .select($"doc_id", Normalize.normalize($"text").as("clean"))
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(streamed == batch)
    // the messy classes actually changed (the stage is doing work)
    assert(docs.count { case (i, t) =>
      batch.find(_._1 == i).get._2 != t } >= 15)
  }
}
