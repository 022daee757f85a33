package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** ES sink document mapping (JsonConverter + IndexNameFormatter parity). */
class ElasticSinkSpec extends SparkSuite {
  import spark.implicits._

  private def rows = Seq(
    ("k1", "click", 1.5, ts("2024-01-15 10:30:00")),
    (null, "view", 2.0, ts("2024-02-01 00:00:00")))
    .toDF("key", "event_type", "value", "ts")

  test("date-pattern index routing substitutes the event time") {
    val idx = rows.select(
      ElasticSink.indexName("logs-%{+yyyy-MM-dd}", col("ts")).as("i"))
      .as[String].collect().sorted
    assert(idx.toSeq == Seq("logs-2024-01-15", "logs-2024-02-01"))
    // multiple segments and trailing literals
    val multi = rows.limit(1).select(ElasticSink.indexName(
      "a-%{+yyyy}-b-%{+MM}-c", col("ts"))).as[String].head()
    assert(multi == "a-2024-b-01-c")
    // no pattern → constant index
    assert(rows.limit(1).select(ElasticSink.indexName("static", col("ts")))
      .as[String].head() == "static")
  }

  test("documents carry _id from key (null key → auto-id) and the row as JSON") {
    val docs = ElasticSink.documents(rows, "ev-%{+yyyy-MM}", "ts",
      idCol = Some("key")).orderBy("index").collect()
    assert(docs(0).getString(0) == "ev-2024-01")
    assert(docs(0).getString(1) == "k1")
    assert(docs(1).isNullAt(1)) // null key → ES assigns the id
    assert(docs(0).getString(2).contains(""""event_type":"click""""))
    assert(!docs(0).getString(2).contains(""""key"""")) // id col not duplicated

    val bulk = ElasticSink.bulkPayload(Iterator(
      ("ev-2024-01", "k1", """{"a":1}"""), ("ev-2024-01", null, """{"a":2}""")))
    val lines = bulk.split("\n")
    assert(lines.length == 4 && bulk.endsWith("\n"))
    assert(lines(0) == """{"index":{"_index":"ev-2024-01","_id":"k1"}}""")
    assert(lines(2) == """{"index":{"_index":"ev-2024-01"}}""") // auto-id
  }

  test("a null event time routes to the fallback index, not a poisoned batch") {
    val withNull = Seq(("k9", "click", null.asInstanceOf[java.sql.Timestamp]))
      .toDF("key", "event_type", "ts")
    val doc = ElasticSink.documents(withNull, "ev-%{+yyyy-MM}", "ts",
      idCol = Some("key")).collect().head
    assert(doc.getString(0) == "ev-unrouted") // date segment → fallback
    // and even a null index can no longer NPE the partition's bulk payload
    val bulk = ElasticSink.bulkPayload(Iterator((null, "k", """{"a":1}""")))
    assert(bulk.startsWith("""{"index":{"_index":""""))
  }

  test("bulk action lines JSON-escape hostile message keys") {
    val bulk = ElasticSink.bulkPayload(Iterator(
      ("idx", "a\"b\\c\nd", """{"x":1}""")))
    val action = bulk.split("\n")(0)
    assert(action == """{"index":{"_index":"idx","_id":"a\"b\\c\nd"}}""")
    // the action line parses as valid JSON
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(action)
    assert(node.get("index").get("_id").asText == "a\"b\\c\nd")
  }

  test("lineEnvelope wraps protocol-source lines with topic provenance") {
    val env = graft.sources.Topics.lineEnvelope(
      Seq("a", "b").toDF("value"), "net-topic")
    assert(env.columns.toSeq == Seq("topic", "value", "offset", "publish_time"))
    val r = env.collect()
    assert(r.map(_.getString(1)).toSet == Set("a", "b"))
    assert(r.forall(_.getString(0) == "net-topic"))
  }

  test("epochOffsets makes line offsets batch-unique for offset-keyed consumers") {
    val batch = graft.sources.Topics.lineEnvelope(
      Seq("a", "b", "c").toDF("value"), "t")
    val off1 = graft.sources.Topics.epochOffsets(batch, 1)
      .select("offset").as[Long].collect().toSet
    val off2 = graft.sources.Topics.epochOffsets(batch, 2)
      .select("offset").as[Long].collect().toSet
    assert(off1.size == 3 && off2.size == 3)
    assert((off1 & off2).isEmpty) // no collisions across micro-batches
  }
}
