package graft.schema

import graft.SparkSuite
import org.apache.spark.sql.types._

/** Avro-rule compatibility matrix over StructType (A7 fixture: add-field
  * BACKWARD, drop-field FORWARD, per AvroSchemaCompatibilityCheck). */
class SchemaCompatSpec extends SparkSuite {
  import SchemaCompat._

  private val v1 = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true)))

  test("adding a nullable field is BACKWARD compatible") {
    val v2 = v1.add(StructField("email", StringType, nullable = true))
    assert(isCompatible(v1, v2, Backward))
    assert(!isCompatible(v1, v2, Forward) ||
      canRead(v2, v1)) // forward holds too: old reader ignores new field
  }

  test("adding a non-nullable field breaks BACKWARD") {
    val v2 = v1.add(StructField("email", StringType, nullable = false))
    assert(!isCompatible(v1, v2, Backward))
    assert(check(v1, v2, Backward).exists(_.contains("email")))
  }

  test("dropping a field is FORWARD compatible (old reader projects)") {
    val v2 = StructType(v1.fields.filter(_.name != "name"))
    assert(isCompatible(v1, v2, Forward) || canRead(v2, v1))
    assert(isCompatible(v1, v2, Backward)) // name was nullable → default
  }

  test("type promotion int→long allowed, long→int rejected") {
    val narrow = StructType(Seq(StructField("x", IntegerType)))
    val wide = StructType(Seq(StructField("x", LongType)))
    assert(canRead(narrow, wide))
    assert(!canRead(wide, narrow))
  }

  test("nested struct fields are checked recursively") {
    val inner1 = StructType(Seq(StructField("a", IntegerType)))
    val inner2 = StructType(Seq(StructField("a", LongType),
      StructField("b", StringType, nullable = true)))
    val w = StructType(Seq(StructField("s", inner1)))
    val r = StructType(Seq(StructField("s", inner2)))
    assert(canRead(w, r))
    assert(!canRead(r, w))
  }

  test("registry gates incompatible updates and versions compatible ones") {
    val reg = new SchemaRegistry(Full)
    assert(reg.register("topic-a", v1) == Right(0))
    val ok = v1.add(StructField("extra", StringType, nullable = true))
    assert(reg.register("topic-a", ok) == Right(1))
    val bad = StructType(Seq(StructField("id", StringType, nullable = false)))
    assert(reg.register("topic-a", bad).isLeft)
    assert(reg.latest("topic-a").contains(ok))
    assert(reg.versions("topic-a").size == 2)
  }
}
