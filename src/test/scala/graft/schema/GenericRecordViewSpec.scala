package graft.schema

import graft.SparkSuite
import org.apache.spark.sql.types._

class GenericRecordViewSpec extends SparkSuite {

  test("dynamic field access over a runtime-schema row, nested") {
    val person = graft.sources.Generator.personBatch(spark, 3).collect().head
    val view = GenericRecordView(person)
    assert(view.getFields.contains("company"))
    assert(view.getField("person_id") == 0L)
    val company = view.getField("company").asInstanceOf[GenericRecordView]
    assert(company.getField("name").toString.endsWith(" Corp"))
    assert(view.getPath("address.city").toString.nonEmpty)
  }

  test("RecordSchemaBuilder builds the fluent runtime schema") {
    val schema = RecordSchemaBuilder.record("person")
      .field("id").`type`(LongType).required().end()
      .field("name").`type`(StringType).optional().end()
      .field("score").`type`(DoubleType).optional().end()
      .build()
    assert(schema.fieldNames.toSeq == Seq("id", "name", "score"))
    assert(!schema("id").nullable && schema("name").nullable)
    // built schemas flow into the rest of the engine: registry-gated
    val reg = new SchemaRegistry(SchemaCompat.Backward)
    assert(reg.register("t", schema).isRight)
  }
}
