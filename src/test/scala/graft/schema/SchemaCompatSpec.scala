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

  test("proto-native: rename at same field number OK; wire-type change breaks") {
    // identity on the proto wire is the field NUMBER — renames are free
    val w = StructType(Seq(StructField("count", IntegerType),
      StructField("label", StringType)))
    val renamed = StructType(Seq(StructField("n", LongType), // varint family
      StructField("tag", BinaryType))) // len family
    assert(checkFormat(ProtoNativeFormat, w, renamed, Full).isEmpty)
    // int32 (varint) → float (fixed32) at field 1 breaks decoding both ways
    val broken = StructType(Seq(StructField("count", FloatType),
      StructField("label", StringType)))
    assert(checkFormat(ProtoNativeFormat, w, broken, Backward).nonEmpty)
    assert(checkFormat(ProtoNativeFormat, w, broken, Forward).nonEmpty)
    // the same change is legal under Avro rules (int→float promotion) —
    // the formats genuinely need different checkers
    assert(checkFormat(AvroFormat, w, broken, Backward).isEmpty)
  }

  test("proto-native: dropping a MIDDLE field is rejected even when neighbors share a wire family") {
    // positional numbering: dropping 'b' (one of two consecutive varints)
    // re-routes 'c' into field 2 — every value decodes "cleanly" into the
    // wrong column, so the gate must flag it, not pass it
    val w = StructType(Seq(StructField("a", LongType),
      StructField("b", LongType), StructField("c", LongType)))
    val middleDropped = StructType(Seq(StructField("a", LongType),
      StructField("c", LongType)))
    assert(checkFormat(ProtoNativeFormat, w, middleDropped, Backward).nonEmpty)
    // a middle INSERT shifts later numbers the same way
    val middleInserted = StructType(Seq(StructField("a", LongType),
      StructField("x", LongType), StructField("b", LongType),
      StructField("c", LongType)))
    assert(checkFormat(ProtoNativeFormat, w, middleInserted, Backward).nonEmpty)
    // the TRAILING drop of the same wire shape stays legal
    val trailingDropped = StructType(Seq(StructField("a", LongType),
      StructField("b", LongType)))
    assert(checkFormat(ProtoNativeFormat, w, trailingDropped, Full).isEmpty)
    // EQUAL-count middle drop + trailing add is the same misrouting and
    // must be flagged too (the shift detector runs at every arity)
    val equalCountShift = StructType(Seq(StructField("a", LongType),
      StructField("c", LongType), StructField("x", LongType)))
    assert(checkFormat(ProtoNativeFormat, w, equalCountShift, Backward).nonEmpty)
    // a rename at a stable number COMBINED with a trailing add is legal
    // when a later position still matches exactly: 'b2' is new on the
    // reader side and the anchored 'c' proves nothing shifted
    val renamePlusTrailing = StructType(Seq(StructField("a", LongType),
      StructField("b2", LongType), StructField("c", LongType),
      StructField("d", LongType)))
    assert(checkFormat(ProtoNativeFormat, w, renamePlusTrailing, Backward).isEmpty)
    // but a rename combined with an arity change and NO later anchor is
    // ambiguous: (a,b,c) -> (a,X) reads equally as "rename b, drop trailing
    // c" and "drop middle b, rename c" — the latter re-routes b's values
    // into X silently, so the pair is rejected
    val unanchoredRename = StructType(Seq(StructField("a", LongType),
      StructField("x", LongType)))
    assert(checkFormat(ProtoNativeFormat, w, unanchoredRename, Backward).nonEmpty)
  }

  test("proto-native: trailing adds/removes OK; repeated-shape change breaks") {
    val w = StructType(Seq(StructField("a", LongType)))
    val added = w.add(StructField("b", StringType, nullable = false))
    // non-nullable trailing add is fine in proto (defaults), not in Avro
    assert(checkFormat(ProtoNativeFormat, w, added, Full).isEmpty)
    assert(checkFormat(AvroFormat, w, added, Backward).nonEmpty)
    assert(checkFormat(ProtoNativeFormat, added, w, Full).isEmpty) // removal
    val repeated = StructType(Seq(StructField("a", ArrayType(LongType))))
    assert(checkFormat(ProtoNativeFormat, w, repeated, Backward).nonEmpty)
  }

  test("json format follows the Avro resolution rules (reference subclassing)") {
    val v2 = v1.add(StructField("email", StringType, nullable = true))
    assert(checkFormat(JsonFormat, v1, v2, Backward).isEmpty)
    val bad = v1.add(StructField("email", StringType, nullable = false))
    assert(checkFormat(JsonFormat, v1, bad, Backward).nonEmpty)
  }

  test("KeyValue: key AND value gated independently, each with its format") {
    val key = StructType(Seq(StructField("id", LongType, nullable = false)))
    val kv1 = KeyValueSchema(AvroFormat, key, ProtoNativeFormat, v1)
    // value evolves legally under proto rules → compatible
    val kv2 = kv1.copy(value = StructType(Seq(
      StructField("id2", LongType, nullable = false),
      StructField("name2", BinaryType, nullable = true))))
    assert(checkKeyValue(kv1, kv2, Full).isEmpty)
    // a breaking KEY change fails even though the value is untouched
    val kvBadKey = kv1.copy(key = StructType(Seq(
      StructField("id", StringType, nullable = false))))
    val errs = checkKeyValue(kv1, kvBadKey, Backward)
    assert(errs.nonEmpty && errs.forall(_.startsWith("key: ")))
    // changing one side's format is always a break
    assert(checkKeyValue(kv1, kv1.copy(valueFormat = AvroFormat), Backward)
      .exists(_.contains("format changed")))
  }

  test("array/map element nullability is part of the read contract") {
    val w = StructType(Seq(StructField("xs",
      ArrayType(StringType, containsNull = true))))
    val r = StructType(Seq(StructField("xs",
      ArrayType(StringType, containsNull = false))))
    assert(!canRead(w, r)) // null elements would reach a non-null reader
    assert(canRead(r, w))  // tightening on the writer side is fine
  }

  test("registry gates with its format's own rules (proto positional break)") {
    val reg = new SchemaRegistry(Backward, ProtoNativeFormat)
    val old = StructType(Seq(StructField("a", IntegerType),
      StructField("b", IntegerType)))
    assert(reg.register("proto-subj", old) == Right(0))
    // inserting a nullable field mid-record passes Avro's by-name rules but
    // shifts proto field numbers: field 2 becomes a string over varint bytes
    val shifted = StructType(Seq(StructField("a", IntegerType),
      StructField("c", StringType, nullable = true),
      StructField("b", IntegerType)))
    assert(reg.register("proto-subj", shifted).isLeft)
    assert(new SchemaRegistry(Backward, AvroFormat) // by-name rules admit it
      .register("s", old).isRight)
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

  test("AUTO_CONSUME decode resolves each message's writer version to the latest view") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val reg = new SchemaRegistry(Backward)
    val v0 = StructType(Seq(StructField("id", IntegerType),
      StructField("name", StringType)))
    val v1s = StructType(Seq(StructField("id", LongType), // int→long promotion
      StructField("name", StringType),
      StructField("email", StringType, nullable = true)))
    assert(reg.register("users", v0) == Right(0))
    assert(reg.register("users", v1s) == Right(1))

    val rows = Seq(
      ("""{"id": 1, "name": "ada"}""", 0),                               // v0 writer
      ("""{"id": 2, "name": "bob", "email": "b@x"}""", 1))               // v1 writer
      .toDF("payload", "schema_version")
    val out = reg.decodeAuto(rows, "users", "payload", "schema_version")
      .select(col("decoded.id"), col("decoded.name"), col("decoded.email"))
      .as[(Long, String, Option[String])].collect().sortBy(_._1)
    // both rows surface in the LATEST schema: id widened to long, the v0
    // writer's missing email defaults to null
    assert(out.toSeq == Seq((1L, "ada", None), (2L, "bob", Some("b@x"))))

    // an unregistered version stamp raises instead of silently nulling
    val drift = Seq(("""{"id": 3}""", 7)).toDF("payload", "schema_version")
    val err = intercept[Exception] {
      reg.decodeAuto(drift, "users", "payload", "schema_version")
        .select(col("decoded")).collect()
    }
    assert(err.getMessage.contains("unknown schema version") ||
      Option(err.getCause).exists(_.getMessage.contains("unknown schema version")))
  }
}
