package graft.ops

import java.nio.file.Files

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The full continuous-dedup pipeline, end to end: documents arrive on a
  * graft topic; each micro-batch probes+appends the persisted LSH index for
  * new candidate pairs and feeds them into the persisted cluster index; the
  * resolved clusters (and the keep-one decision) must equal the one-shot
  * computation over the whole corpus — then survive the maintenance
  * compaction both stores run under the cron loop. */
class StreamingDedupPipelineSpec extends SparkSuite {
  import spark.implicits._

  private def corpus() = {
    val boiler = "alpha beta gamma delta epsilon zeta eta theta"
    ((1L to 6L).map(i => (i, s"$boiler variant$i")) ++
      (7L to 12L).map(i =>
        (i, s"totally different prose number $i with unique words w$i x$i y$i z$i")) ++
      (13L to 16L).map(i => (i, s"$boiler variant${i - 12}")))
      .toDF("doc_id", "text")
  }

  test("stream → pair index → cluster index equals the one-shot clusters") {
    val topic = Files.createTempDirectory("pipe-topic").toFile.getAbsolutePath
    val cp = Files.createTempDirectory("pipe-cp").toFile.getAbsolutePath
    val lshDir = Files.createTempDirectory("pipe-lsh").toFile.getAbsolutePath
    val ccDir = Files.createTempDirectory("pipe-cc").toFile.getAbsolutePath
    val lsh = new MinHashIndex(spark, lshDir, "doc_id", "text")
    val cc = new ComponentsIndex(spark, ccDir)
    val docs = corpus()

    def writeDocs(pred: org.apache.spark.sql.Column): Unit =
      docs.where(pred)
        .select(col("doc_id").cast("string").as("key"), col("text").as("value"))
        .write.format("graft-topic").mode("append").option("path", topic).save()

    val q = spark.readStream.format("graft-topic").option("path", topic).load()
      .select(col("key").cast("long").as("doc_id"), col("value").as("text"))
      .writeStream
      .foreachBatch { (b: DataFrame, epochId: Long) =>
        val pairs = lsh.addAndFindPairs(b, batchOrd = epochId)
        cc.addPairs(pairs, ord = epochId)
      }
      .option("checkpointLocation", cp)
      .start()
    writeDocs(col("doc_id") <= 5)
    q.processAllAvailable()
    writeDocs(col("doc_id") > 5 && col("doc_id") <= 13)
    q.processAllAvailable()
    writeDocs(col("doc_id") > 13)
    q.processAllAvailable()
    q.stop()

    val oneShot = Components.connected(
      MinHashLsh.candidatePairs(docs, "doc_id", "text"), "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    assert(oneShot.nonEmpty)
    def resolved() = cc.resolveAll().as[(Long, Long)].collect().toMap
    assert(resolved() == oneShot,
      "streamed pipeline must land on the one-shot clusters")

    // the keep-one decision over the final corpus matches too
    val streamedKeep = Components.keepBest(docs, "doc_id",
      cc.resolveAll(), length(col("text")))
      .as[(Long, Long, Long)].collect().toSet
    val oneShotKeep = Components.keepBest(docs, "doc_id",
      Components.clusters(docs, "doc_id", "text"), length(col("text")))
      .as[(Long, Long, Long)].collect().toSet
    assert(streamedKeep == oneShotKeep)

    // the maintenance pass both stores run forever: results unchanged
    lsh.compact()
    cc.compact()
    assert(resolved() == oneShot, "compaction must not change clusters")
  }
}
