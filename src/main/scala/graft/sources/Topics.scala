package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamReader

/** Topic-subscription surfaces over the graft-topic DSv2 source (and any
  * directory-of-topics layout): multi-topic and regex subscribe, reader
  * seek, batch-receive pacing.
  */
object Topics {

  /** Subscribe to several topics at once (multi-topic consumer,
    * reference: ConsumerBuilder.topics) — UNION ALL of the per-topic streams
    * with the origin topic already in the envelope. */
  def subscribeMulti(spark: SparkSession, dirs: Seq[String]): DataFrame =
    dirs.map(d => spark.readStream.format("graft-topic").option("path", d).load())
      .reduce(_ unionByName _)

  /** Regex subscribe (reference: ConsumerBuilder.topicsPattern
    * ConsumerBuilder.java:140-157): topics under `root` whose name matches
    * `pattern`. The source re-resolves the matching topic directories at
    * every micro-batch plan, so topics created mid-stream join WITHOUT a
    * restart — the periodic recheck of
    * PatternMultiTopicsConsumerImpl.java:50,67,96. */
  def subscribePattern(spark: SparkSession, root: String, pattern: String): DataFrame =
    spark.readStream.format("graft-topic")
      .option("path", root).option("subscribePattern", pattern).load()

  /** Bounded Reader scan from a start position (reference: Reader.java:148-174
    * seek by MessageId / timestamp): batch read with the seek predicate pushed
    * into segment pruning. */
  def readerFrom(spark: SparkSession, dir: String,
                 startOffset: Option[Long] = None,
                 startTime: Option[java.sql.Timestamp] = None): DataFrame = {
    var df = spark.read.format("graft-topic").option("path", dir).load()
    startOffset.foreach(o => df = df.where(col("offset") >= o))
    startTime.foreach(t => df = df.where(col("publish_time") >= lit(t)))
    df
  }

  /** Batch-receive pacing (reference: BatchReceivePolicy maxNumMessages /
    * timeout, ConsumerBuilder.java:675): micro-batch admission control via
    * trigger interval; per-source rate caps belong on the source options
    * (maxOffsetsPerTrigger-style) when the source supports admission limits. */
  def pacedReader(r: DataStreamReader, dir: String): DataFrame =
    r.format("graft-topic").option("path", dir).load()

  /** File source (reference: pulsar-io/file FileSource/FileListingThread —
    * watch a directory, publish each line with file provenance): Spark's
    * streaming text source already handles listing/offsets/compression
    * (gzip transparent); we add the envelope columns the connector attaches. */
  def fileSource(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.text(dir)
      .select(
        col("value"),
        input_file_name().as("source_file"),
        current_timestamp().as("publish_time"))

  /** Bounded variant for backfill. */
  def fileSourceBatch(spark: SparkSession, dir: String): DataFrame =
    spark.read.text(dir)
      .select(col("value"), input_file_name().as("source_file"))

  /** Protocol-source envelope: wrap any line-delivering stream (Spark's
    * `socket` source, a rate source, an HTTP/NSQ/RabbitMQ bridge emitting a
    * `value` column — the reference's protocol connectors
    * pulsar-io/{netty,http,nsq,rabbitmq} all reduce to this) with the topic
    * provenance columns the graft envelope expects.
    *
    * Offsets are unique within ONE batch only (`monotonically_increasing_id`
    * restarts every micro-batch) — a STREAMING caller feeding offset-keyed
    * ops (dedup, TableView) must fold in the epoch via [[epochOffsets]]
    * inside `foreachBatch`. */
  def lineEnvelope(lines: DataFrame, topic: String): DataFrame =
    lines.select(
      lit(topic).as("topic"),
      col("value").cast("string").as("value"),
      monotonically_increasing_id().as("offset"),
      current_timestamp().as("publish_time"))

  /** Batch-unique offsets: (batchId << 40) + within-batch id. The mid layout
    * is (taskPartition << 33) | row, so this is collision-free while a batch
    * stays under 128 tasks and 2^33 rows per task — widen the shift beyond
    * that. */
  def epochOffsets(env: DataFrame, batchId: Long): DataFrame =
    env.withColumn("offset", lit(batchId * (1L << 40)) + col("offset"))

  /** Socket ingestion (the netty/HTTP test-fixture analog): Spark's built-in
    * TextSocketSource + [[lineEnvelope]]. */
  def socketSource(spark: SparkSession, host: String, port: Int,
                   topic: String): DataFrame =
    lineEnvelope(spark.readStream.format("socket")
      .option("host", host).option("port", port).load(), topic)
}
