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

  test("cascade → chunk stage: replayed micro-batch leaves the chunk store unchanged") {
    // the curate stage's front half (StreamBench wiring): cascade verdict
    // gates the batch, kept docs are chunked into an epoch-partitioned
    // store with dynamic overwrite — re-running an epoch (foreachBatch's
    // redelivery contract) must overwrite its own partition, not append
    val topic = Files.createTempDirectory("chunk-topic").toFile.getAbsolutePath
    val cp = Files.createTempDirectory("chunk-cp").toFile.getAbsolutePath
    val chunkDir = Files.createTempDirectory("chunk-store").toFile.getAbsolutePath
    val rules = Seq("length" -> (length(col("text")) >= 30L))
    val docs = corpus()
    val attrition = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    // every delivered batch's rows, for a later VERBATIM redelivery
    val seen = scala.collection.mutable.Map.empty[Long, Seq[(Long, String)]]

    def runBatch(b: DataFrame, e: Long): Unit = {
      seen(e) = b.select(col("doc_id"), col("text"))
        .as[(Long, String)].collect().toSeq
      val decided = FilterCascade.decide(b, "doc_id", rules)
        .localCheckpoint(true)
      val att = FilterCascade.attrition(decided, rules.map(_._1))
        .collect().head
      attrition += ((att.getAs[Long]("n_docs"), att.getAs[Long]("n_keep")))
      val kept = b.join(decided.where(col("keep")).select("doc_id"),
        Seq("doc_id"))
      RagChunk.chunks(kept, "doc_id", "text", window = 6, stride = 4)
        .withColumn("batch", lit(e))
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch").parquet(chunkDir)
    }

    docs.select(col("doc_id").cast("string").as("key"),
        col("text").as("value"))
      .write.format("graft-topic").mode("append").option("path", topic).save()
    val q = spark.readStream.format("graft-topic").option("path", topic).load()
      .select(col("key").cast("long").as("doc_id"), col("value").as("text"))
      .writeStream
      .foreachBatch(runBatch _)
      .option("checkpointLocation", cp)
      .start()
    q.processAllAvailable(); q.stop()

    assert(attrition.nonEmpty && attrition.map(_._2).sum > 0)
    val chunks = spark.read.parquet(chunkDir)
    val before = chunks.orderBy("doc_id", "chunk_idx")
      .collect().toSeq
    assert(before.nonEmpty, "kept docs must produce chunks")
    // only cascade-kept documents reached the chunker
    val chunkedIds = chunks.select("doc_id").distinct()
      .as[Long].collect().toSet
    val keptIds = docs.where(length(col("text")) >= 30)
      .select("doc_id").as[Long].collect().toSet
    assert(chunkedIds == keptIds)

    // redeliver the LAST epoch verbatim: the store must not grow or change
    val lastEpoch = seen.keys.max
    runBatch(seen(lastEpoch).toDF("doc_id", "text"), lastEpoch)
    val after = spark.read.parquet(chunkDir).orderBy("doc_id", "chunk_idx")
      .collect().toSeq
    assert(after == before, "replayed epoch must be idempotent")
  }
}
