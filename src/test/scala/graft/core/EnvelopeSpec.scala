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
