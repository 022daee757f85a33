package graft

import java.nio.file.Files

import graft.core.{Envelope, Tables}
import graft.ops.Compaction
import org.apache.spark.sql.functions._

/** Full-pipeline integration over the driver's real testdata (FIXTURES §B):
  * events → Message envelope → graft-topic segments → Structured Streaming
  * (watermarked window agg; stateful TableView) — every streaming answer
  * cross-checked against the equivalent batch computation on the same rows.
  */
class EndToEndPipelineSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def topicDir(): String = {
    val dir = Files.createTempDirectory("e2e-topic").toFile.getAbsolutePath
    val env = Envelope.fromEvents(Tables.events(spark, sf))
      .select(col("topic"), col("partition"), col("offset"), col("key"),
        decode(col("value"), "UTF-8").as("value"), col("event_time"),
        col("publish_time"), col("producer_name"), col("sequence_id"))
    // replay in 4 sealed segments ordered by offset (publisher batches)
    env.withColumn("seg", (col("offset") % 4).cast("int"))
      .repartitionByRange(4, col("seg"))
      .sortWithinPartitions(col("offset"))
      .drop("seg")
      .write.format("graft-topic").option("path", dir).mode("append").save()
    dir
  }

  test("LLM training-data pipeline end-to-end: filter → dedup → near-dup → stats") {
    import graft.functions.TextFunctions
    import graft.ops.MinHashLsh
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val total = docs.count()

    // 1. quality + language gate (the usual first pass of a corpus build)
    val gated = docs
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .withColumn("lang_pred", TextFunctions.langId(col("text")))
      .where(col("quality") > 0.2 && TextFunctions.tokenCount(col("text")) >= 5)
    val gatedN = gated.count()
    assert(gatedN > 0 && gatedN <= total)

    // 2. exact dedup on the normalized fingerprint — keep the smallest doc_id
    val keeperPerFp = gated
      .withColumn("fp", TextFunctions.fingerprint(col("text")))
      .groupBy("fp").agg(min_by(struct(gated.columns.map(col).toIndexedSeq: _*),
        col("doc_id")).as("d"), count(lit(1)).as("copies"))
    val exactDeduped = keeperPerFp.select(col("d.*"))
    val exactN = exactDeduped.count()
    assert(exactN <= gatedN)

    // 3. near-dup removal: minhash-LSH candidates verified by true Jaccard,
    //    drop the larger id of each confirmed pair
    val pairs = MinHashLsh.candidatePairs(exactDeduped, "doc_id", "text")
    val confirmed = MinHashLsh
      .jaccardOfPairs(pairs, exactDeduped, "doc_id", "text")
      .where(col("jaccard") >= 0.7)
    val dropIds = confirmed.select(col("doc_b").as("doc_id")).distinct()
    val corpus = exactDeduped.join(dropIds, Seq("doc_id"), "left_anti")
    val corpusN = corpus.count()
    assert(corpusN == exactN - dropIds.count())

    // 4. corpus stats a data curator reads off the final set
    val stats = corpus.agg(
      count(lit(1)).as("docs"),
      sum(TextFunctions.tokenCount(col("text"))).as("tokens"),
      avg(col("quality")).as("avg_quality")).head()
    assert(stats.getLong(0) == corpusN && stats.getLong(1) > 0)

    // every dropped near-dup still has its representative in the corpus
    val orphans = confirmed.join(dropIds.withColumnRenamed("doc_id", "doc_b"),
      Seq("doc_b"))
      .join(corpus.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_anti")
      // doc_a itself may have been dropped via another pair — then ITS keeper
      // survives; verify transitively that some corpus doc covers each drop
      .join(dropIds.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"), "left_anti")
    assert(orphans.isEmpty)
  }

  test("corpus assembly end-to-end: gopher → bloom dedup → semdedup → mix → split → shards → card") {
    import graft.ops._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")

    // 1. Gopher rule gate (thresholds loose enough to keep a majority)
    val gated = docs.join(GopherQuality.battery(docs, "doc_id", "text",
        minWords = 10L, maxMeanLen = 6L, maxDupNum = 4L, maxDupDen = 5L)
      .where(col("keep")).select("doc_id"), Seq("doc_id"))
    val gatedN = gated.count()
    assert(gatedN > 0 && gatedN < docs.count())

    // 2. incremental exact dedup through the bloom-screened index,
    //    ingested as two batches
    val idx = new ExactDedupIndex(spark, Files
      .createTempDirectory("e2e-exidx").toFile.getAbsolutePath,
      "doc_id", "text")
    idx.addAndDedup(gated.where(col("doc_id") % 2 === 0), 1L, bloom = true)
    idx.addAndDedup(gated.where(col("doc_id") % 2 === 1), 2L, bloom = true)
    val deduped = gated.join(idx.keepers()
      .select(col("keeper_id").as("doc_id")), Seq("doc_id"), "left_semi")
    val dedupedN = deduped.count()
    assert(dedupedN > 0 && dedupedN <= gatedN)

    // 3. semantic prune: drop every non-keeper of an embedding ε-group
    val semDropped = SemDedup.clusters(emb, "vec_id", "embedding", "label",
      tau = 0.33).where(col("vec_id") =!= col("component"))
      .select(col("vec_id").as("doc_id"))
    val corpus = deduped.join(semDropped, Seq("doc_id"), "left_anti")
    val corpusN = corpus.count()
    assert(corpusN == dedupedN - semDropped.join(deduped, Seq("doc_id"),
      "left_semi").count())

    // 4. α=1/2 temperature mix across sources
    val mixed = Sampling.temperatureTopK(corpus, "source", col("doc_id"),
      col("n_chars"), totalRows = 40L)
    val mixedN = mixed.count()
    assert(mixedN > 0 && mixedN <= 40L)

    // 5. split assignment + one epoch of the train slice, materialized
    val withSplit = mixed.join(Shards.splitAssign(mixed, "doc_id", 3L,
      Seq(("train", 90), ("val", 5), ("test", 5)))
      .select("doc_id", "split"), Seq("doc_id"))
    val train = withSplit.where(col("split") === "train")
    val out = Files.createTempDirectory("e2e-epoch").toFile.getAbsolutePath
    Shards.writeEpoch(train, "doc_id", seed = 1L, nShards = 4, out)
    assert(spark.read.parquet(out).count() == train.count())

    // 6. the data card totals reconcile with the final mix
    val card = CorpusReport.dataCard(mixed, "doc_id", "text", "n_chars",
      "source", minWords = 10L, maxMeanLen = 6L, maxDupNum = 4L,
      maxDupDen = 5L)
    assert(card.agg(sum("n_docs")).head().getLong(0) == mixedN)
    // every mixed doc passed the gate in step 1, so the pass count is total
    assert(card.agg(sum("n_quality_pass")).head().getLong(0) == mixedN)
  }

  test("replayed topic: streaming windowed agg equals batch answer") {
    val dir = topicDir()
    val stream = spark.readStream.format("graft-topic").option("path", dir)
      .load()
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("window.start")).as("w"), col("n"))
    val q = stream.writeStream.format("memory").queryName("e2e_win")
      .outputMode("complete").start()
    q.processAllAvailable()
    val streamed = spark.table("e2e_win").as[(Long, Long)].collect().toMap
    q.stop()

    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("window.start")).as("w"), col("n"))
      .as[(Long, Long)].collect().toMap
    assert(streamed == batch)
    assert(streamed.values.sum == 1000L) // sf0.001 events row count
  }

  test("replayed topic: streaming TableView equals batch compaction") {
    val dir = topicDir()
    val typed = spark.readStream.format("graft-topic").option("path", dir)
      .load()
      .select(col("key"), col("value"), col("offset"),
        col("event_time").as("eventTime"))
      .as[graft.streaming.KeyedMsg]
    val q = graft.streaming.StatefulOps.tableViewStream(typed)
      .writeStream.format("memory").queryName("e2e_tv")
      .outputMode("update").start()
    q.processAllAvailable()
    val rows = spark.table("e2e_tv").as[graft.streaming.KeyUpdate].collect()
    q.stop()
    val streamedLatest = rows.groupBy(_.key)
      .map { case (k, v) => k -> v.maxBy(_.offset).offset }

    val batchLatest = Compaction.compact(
      Envelope.fromEvents(Tables.events(spark, sf)), Seq("key"), col("offset"))
      .select(col("key"), col("offset")).as[(String, Long)].collect().toMap
    assert(streamedLatest == batchLatest)
    assert(streamedLatest.size == 15) // one entry per distinct user key
  }
}
