package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The message envelope — the reference's `Message`/`MessageMetadata` surface
  * (reference: pulsar-client-api/.../Message.java:41-281,
  * pulsar-common/src/main/proto/PulsarApi.proto:106-162) expressed as a Spark
  * schema, exactly like Spark's Kafka source contract.
  *
  * A topic is an unbounded DataFrame with this schema; a bounded Reader scan is
  * a batch DataFrame with the same schema. Payload decode (the reference's
  * schema registry) is a projection from `value: binary` to typed columns.
  */
object Envelope {
  val schema: StructType = StructType(Seq(
    StructField("topic", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("key", StringType, nullable = true),
    StructField("ordering_key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = false),
    StructField("properties", MapType(StringType, StringType), nullable = true),
    StructField("event_time", TimestampType, nullable = true),
    StructField("publish_time", TimestampType, nullable = false),
    StructField("producer_name", StringType, nullable = false),
    StructField("sequence_id", LongType, nullable = false),
    StructField("deliver_at", TimestampType, nullable = true),
    StructField("redelivery_count", IntegerType, nullable = false),
    StructField("schema_version", BinaryType, nullable = true),
    StructField("replicated_from", StringType, nullable = true)
  ))

  /** Wrap the `events` table into the envelope: user_id is the partition key
    * (reference: partition_key, PulsarApi.proto:116), event_id the per-producer
    * sequence (dedup key, Message.java:123), ts doubles as event & publish time.
    * `partition` mirrors key-hash routing (Murmur3 on key,
    * reference: RoundRobinPartitionMessageRouterImpl.java:74). */
  def fromEvents(events: DataFrame, numPartitions: Int = 32): DataFrame =
    events.select(
      lit("events").as("topic"),
      pmod(hash(col("user_id")), lit(numPartitions)).as("partition"),
      col("event_id").as("offset"),
      col("user_id").cast(StringType).as("key"),
      lit(null).cast(BinaryType).as("ordering_key"),
      encode(to_json(struct(col("event_type"), col("value"), col("props"))), "UTF-8").as("value"),
      map(lit("event_type"), col("event_type")).as("properties"),
      col("ts").as("event_time"),
      col("ts").as("publish_time"),
      concat(lit("producer-"), pmod(col("user_id"), lit(8)).cast(StringType)).as("producer_name"),
      col("event_id").as("sequence_id"),
      lit(null).cast(TimestampType).as("deliver_at"),
      lit(0).as("redelivery_count"),
      lit(null).cast(BinaryType).as("schema_version"),
      lit(null).cast(StringType).as("replicated_from")
    )

  /** Typed decode of the JSON payload back to columns — the reference's
    * AUTO_CONSUME / GenericRecord access (client/api/schema/GenericRecord.java:63). */
  def decodeJson(env: DataFrame, payloadSchema: StructType): DataFrame =
    env.withColumn("decoded", from_json(decode(col("value"), "UTF-8"), payloadSchema))

  /** Key-hash dispatch filter: the slice of the stream consumer i of n sees
    * under Key_Shared — the simple mod-hash form (reference:
    * HashRangeAutoSplitStickyKeyConsumerSelector-style uniform split). */
  def keySharedSlice(env: DataFrame, consumer: Int, numConsumers: Int): DataFrame =
    env.where(pmod(hash(col("key")), lit(numConsumers)) === lit(consumer))

  /** The Key_Shared ring size (reference:
    * StickyKeyConsumerSelector.DEFAULT_RANGE_SIZE = 2 << 15). */
  val KeySharedRangeSize: Int = 2 << 15

  /** Consistent-hash ring for Key_Shared dispatch (reference:
    * ConsistentHashingStickyKeyConsumerSelector.java:41-108): each consumer
    * hashes `pointsPerConsumer` points onto a 2<<15 ring; a key is served by
    * the consumer owning the first ring point at/after hash(key) mod range
    * (wrapping to the first point). The observable difference from mod-hash:
    * when a consumer joins, ONLY the keys in the ranges its points claim
    * move — and they all move TO the new consumer; no key migrates between
    * existing consumers. */
  def keySharedRing(consumers: Seq[String], pointsPerConsumer: Int = 100,
                    rangeSize: Int = KeySharedRangeSize): Seq[(Int, String)] =
    consumers.flatMap { c =>
      (0 until pointsPerConsumer).map { i =>
        (math.floorMod(
          scala.util.hashing.MurmurHash3.stringHash(s"${c}_$i"), rangeSize), c)
      }
    }.sortBy(identity)

  /** The consumer a key is dispatched to, as a pure Column over the
    * (broadcast-literal) ring — the selector's `select(keyHash)`. One array
    * literal + a filter expression, so ring size never deepens the plan.
    * The key position is the first 16 md5 bits ([[graft.functions
    * .TextFunctions.hash16]]) rather than the reference's Murmur3 — equally
    * uniform, and reproducible by the SQL oracle bit-for-bit (the 2<<15
    * default range is exactly the hash16 codomain). */
  def keySharedConsistentAssign(keyCol: Column, ring: Seq[(Int, String)],
                                rangeSize: Int = KeySharedRangeSize): Column = {
    require(ring.nonEmpty, "ring needs at least one consumer point")
    val posCol = pmod(graft.functions.TextFunctions.hash16(keyCol), lit(rangeSize))
    val ringArr = typedlit(ring)
    val owning = filter(ringArr, e => e.getField("_1") >= posCol)
    when(size(owning) > 0, element_at(owning, 1).getField("_2"))
      .otherwise(lit(ring.head._2)) // wrap around the ring
  }

  /** The slice of the stream one consumer sees under consistent-hash
    * Key_Shared. */
  def keySharedConsistentSlice(env: DataFrame, consumer: String,
                               ring: Seq[(Int, String)]): DataFrame =
    env.where(keySharedConsistentAssign(col("key"), ring) === lit(consumer))

  /** Message routing modes (reference: MessageRoutingMode.java:39-55,
    * RoundRobinPartitionMessageRouterImpl.java:74 — keyed messages hash,
    * unkeyed round-robin; SinglePartition pins everything to one). Returns
    * the DataFrame repartitioned per the chosen router — the produce-side
    * partition assignment. */
  def routeKeyHash(df: DataFrame, numPartitions: Int, keyCol: String = "key"): DataFrame =
    df.repartition(numPartitions, col(keyCol))

  def routeRoundRobin(df: DataFrame, numPartitions: Int): DataFrame =
    df.repartition(numPartitions) // RoundRobinPartitioning

  def routeSinglePartition(df: DataFrame): DataFrame =
    df.coalesce(1)

  def routeCustom(df: DataFrame, numPartitions: Int, routingExpr: Column): DataFrame =
    df.repartition(numPartitions, routingExpr)
}
