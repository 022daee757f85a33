package graft.streaming

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-sink transactional produce — the reference's transaction machinery
  * (coordinator + transaction buffer + commit marker; reference:
  * pulsar-broker/.../TransactionMetadataStoreService.java,
  * transaction/buffer/impl/TopicTransactionBuffer.java: data is written to
  * the topic immediately but only *visible* once the commit marker lands)
  * mapped onto the segment log:
  *
  *  - within `foreachBatch`, the epoch's rows are written to every sink
  *    topic as epoch-stamped segments (idempotent on replay) via a
  *    DISTRIBUTED json write — the driver only renames files (metadata);
  *  - a commit marker `txn-<epoch>.commit` is written to the txn log LAST;
  *  - [[committedRead]] surfaces only epoch segments whose marker exists.
  *
  * Crash anywhere before the marker ⇒ the epoch is invisible in EVERY sink;
  * the checkpoint replays it and the idempotent names dedupe. That is
  * atomic visibility across sinks — the guarantee a plain per-sink epoch
  * commit lacks.
  */
object Transactions {

  private def markerFile(txnLogDir: String, epochId: Long): File =
    new File(txnLogDir, f"txn-e$epochId%010d.commit")

  /** foreachBatch body: write `batch` to every sink topic, then commit. */
  def writeAll(batch: DataFrame, epochId: Long, sinks: Seq[String],
               txnLogDir: String): Unit = {
    sinks.foreach { dir =>
      new File(dir).mkdirs()
      val staging = new File(dir, f".txn-stage-e$epochId%010d")
      batch.write.mode("overwrite").json(staging.getAbsolutePath)
      // idempotent epoch replay: clear EVERY part of an earlier attempt
      // first — a replay may produce fewer partitions (AQE/shuffle config),
      // and an orphaned higher-numbered part would become visible once the
      // marker lands, breaking atomic visibility
      Option(new File(dir).listFiles((_, n) =>
        n.startsWith(f"segment-txn-e$epochId%010d-") && n.endsWith(".jsonl")))
        .getOrElse(Array.empty).foreach(_.delete())
      // seal: rename part files to epoch-stamped segments (metadata only)
      val parts = staging.listFiles((_, n) => n.startsWith("part-")).sorted
      parts.zipWithIndex.foreach { case (p, i) =>
        val target = new File(dir, f"segment-txn-e$epochId%010d-p$i%05d.jsonl")
        p.renameTo(target)
      }
      staging.listFiles().foreach(_.delete())
      staging.delete()
    }
    new File(txnLogDir).mkdirs()
    // commit point: the marker write is the atomic step
    markerFile(txnLogDir, epochId).createNewFile()
  }

  /** Epochs with a commit marker. */
  def committedEpochs(txnLogDir: String): Set[Long] = {
    val d = new File(txnLogDir)
    if (!d.exists()) Set.empty
    else d.listFiles((_, n) => n.startsWith("txn-e") && n.endsWith(".commit"))
      .map(f => f.getName.stripPrefix("txn-e").stripSuffix(".commit").toLong)
      .toSet
  }

  /** Read a sink topic surfacing ONLY committed epochs — the transaction
    * buffer's visibility filter. */
  def committedRead(spark: SparkSession, sinkDir: String,
                    txnLogDir: String): DataFrame = {
    val committed = committedEpochs(txnLogDir)
    val files = Option(new File(sinkDir)
      .listFiles((_, n) => n.startsWith("segment-txn-e") && n.endsWith(".jsonl")))
      .getOrElse(Array.empty)
      .filter { f =>
        val epoch = f.getName.stripPrefix("segment-txn-e")
          .takeWhile(_.isDigit).toLong
        committed.contains(epoch)
      }
      .map(_.getAbsolutePath)
    if (files.isEmpty)
      spark.emptyDataFrame.withColumn("value", lit(null).cast("string"))
    else spark.read.json(files.toIndexedSeq: _*)
  }
}
