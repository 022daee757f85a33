package graft.core

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class EnvelopeSpec extends SparkSuite {
  import spark.implicits._

  private def events = Seq(
    (0L, ts("2024-01-01 00:00:00"), 13L, "error", 185.22, """{"k": 87}"""),
    (1L, ts("2024-01-01 00:16:06"), 12L, "signup", 106.03, """{"k": 0}""")
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("fromEvents produces the full envelope schema") {
    val env = Envelope.fromEvents(events)
    assert(env.schema.fieldNames.toSeq == Envelope.schema.fieldNames.toSeq)
    val row = env.orderBy("offset").collect().head
    assert(row.getAs[String]("key") == "13")
    assert(row.getAs[Long]("sequence_id") == 0L)
    assert(row.getAs[String]("producer_name") == "producer-5") // 13 % 8
  }

  test("decodeJson recovers the typed payload") {
    val payload = StructType(Seq(StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val dec = Envelope.decodeJson(Envelope.fromEvents(events), payload)
      .select(col("offset"), col("decoded.event_type"), col("decoded.value"))
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(dec(0) == ((0L, "error", 185.22)))
    assert(dec(1) == ((1L, "signup", 106.03)))
  }

  test("keySharedSlice partitions keys disjointly and completely") {
    val env = Envelope.fromEvents(events)
    val n = 3
    val total = (0 until n).map(i =>
      Envelope.keySharedSlice(env, i, n).count()).sum
    assert(total == env.count()) // every message to exactly one consumer
  }

  test("consistent-hash Key_Shared: a joining consumer steals ranges, never reshuffles") {
    val keys = (0 until 2000).map(i => s"key-$i").toDF("key")
    val ring3 = Envelope.keySharedRing(Seq("c-a", "c-b", "c-c"), 50)
    val ring4 = Envelope.keySharedRing(Seq("c-a", "c-b", "c-c", "c-d"), 50)
    val rows = keys.select(col("key"),
      Envelope.keySharedConsistentAssign(col("key"), ring3).as("before"),
      Envelope.keySharedConsistentAssign(col("key"), ring4).as("after"))
      .as[(String, String, String)].collect()
    // total function: every key owned, and by a real consumer
    assert(rows.forall(r => Set("c-a", "c-b", "c-c").contains(r._2)))
    // roughly balanced across the 3 consumers (100-point ring)
    val byOwner = rows.groupBy(_._2).view.mapValues(_.size)
    assert(byOwner.size == 3 && byOwner.values.forall(n => n > 300 && n < 1200))
    // THE consistent-hash property (vs mod-hash): when c-d joins, every key
    // that moves moves TO c-d; no key migrates between existing consumers
    val moved = rows.filter(r => r._2 != r._3)
    assert(moved.nonEmpty && moved.forall(_._3 == "c-d"))
    assert(moved.size < rows.length / 2) // a join never reshuffles the world
    // per-consumer slices are disjoint and complete
    val env = keys.withColumnRenamed("key", "key")
    val sliceSizes = Seq("c-a", "c-b", "c-c").map(c =>
      Envelope.keySharedConsistentSlice(env, c, ring3).count())
    assert(sliceSizes.sum == 2000)
  }

  test("generator produces deterministic nested Person records") {
    val p1 = graft.sources.Generator.personBatch(spark, 10).collect()
    val p2 = graft.sources.Generator.personBatch(spark, 10).collect()
    assert(p1.toSeq == p2.toSeq)
    val row = p1.head
    assert(row.schema.fieldNames.contains("company"))
    assert(row.getAs[org.apache.spark.sql.Row]("address")
      .schema.fieldNames.toSeq ==
      Seq("street", "streetNumber", "apartmentNumber", "postalCode", "city"))
  }
}
