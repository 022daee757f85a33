package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka ↔ topic bridge — the pulsar-io Kafka connector pair
  * (reference: pulsar-io/kafka/src/main/java/org/apache/pulsar/io/kafka/
  * {KafkaAbstractSource,KafkaAbstractSink}.java) re-expressed over Spark's
  * built-in Kafka connector contract.
  *
  * Spark's Kafka source emits a fixed schema (key/value binary, topic,
  * partition, offset, timestamp, timestampType, headers); the bridge is the
  * pure column mapping between that contract and the graft envelope, plus the
  * option builders for the real `format("kafka")` read/write. The mapping is
  * unit-tested against the contract schema; the live connector is the
  * standard spark-sql-kafka artifact (not bundled here — zero-egress build).
  */
object KafkaBridge {

  /** Spark's Kafka source schema — the connector's published contract. */
  val kafkaSourceSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Kafka rows → graft envelope: key/value decoded as UTF-8 strings (the
    * source connector's default StringDeserializer posture), Kafka's
    * (topic, partition, offset, timestamp) carried through — timestamp is
    * the broker append time, i.e. publish_time. Kafka has no producer
    * sequence; offset is the dedup-stable sequence per (topic, partition). */
  def fromKafka(kafka: DataFrame, producerName: String = "kafka-bridge"): DataFrame =
    kafka.select(
      col("topic"),
      col("partition"),
      col("offset"),
      decode(col("key"), "UTF-8").as("key"),
      decode(col("value"), "UTF-8").as("value"),
      col("timestamp").as("event_time"),
      col("timestamp").as("publish_time"),
      lit(producerName).as("producer_name"),
      col("offset").as("sequence_id"))

  /** Envelope → the columns Spark's Kafka SINK consumes (key, value, topic —
    * binary/string key+value; partition left to the producer's partitioner,
    * matching the sink connector's routing). */
  def toKafka(envelope: DataFrame, targetTopic: Option[String] = None): DataFrame = {
    val topicCol = targetTopic.map(lit).getOrElse(col("topic"))
    envelope.select(
      col("key").cast(StringType).as("key"),
      col("value").cast(StringType).as("value"),
      topicCol.as("topic"))
  }

  /** Reader options for the live connector: `spark.readStream.format("kafka")
    * .options(sourceOptions(...)).load()` then [[fromKafka]]. startingTime
    * maps to Kafka's per-partition startingOffsetsByTimestamp posture. */
  def sourceOptions(bootstrapServers: String, topics: Seq[String],
                    startingTimeMs: Option[Long] = None,
                    maxOffsetsPerTrigger: Option[Long] = None): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topics.mkString(",")) ++
      startingTimeMs.map(t => "startingTimestamp" -> t.toString) ++
      maxOffsetsPerTrigger.map(n => "maxOffsetsPerTrigger" -> n.toString)

  /** Regex subscription variant (subscribePattern ↔ topicsPattern parity). */
  def sourcePatternOptions(bootstrapServers: String,
                           pattern: String): Map[String, String] =
    Map("kafka.bootstrap.servers" -> bootstrapServers,
      "subscribePattern" -> pattern)

  def sinkOptions(bootstrapServers: String, topic: String): Map[String, String] =
    Map("kafka.bootstrap.servers" -> bootstrapServers, "topic" -> topic)

  /** Full read wiring (requires the spark-sql-kafka connector on the
    * classpath at deploy time). */
  def source(spark: SparkSession, bootstrapServers: String,
             topics: Seq[String]): DataFrame =
    fromKafka(spark.readStream.format("kafka")
      .options(sourceOptions(bootstrapServers, topics)).load())
}
