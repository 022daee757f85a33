package graft.schema

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** A7 fixture: nested Person record through the Avro wire format, including
  * schema-resolution reads (the evolution path SchemaCompat gates). */
class AvroCodecSpec extends SparkSuite {
  import spark.implicits._

  private val personSchema = StructType(Seq(
    StructField("person_id", LongType, nullable = false),
    StructField("firstName", StringType, nullable = false),
    StructField("email", StringType, nullable = true),
    StructField("company", StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("domain", StringType, nullable = true))), nullable = true),
    StructField("tags", ArrayType(StringType), nullable = true)))

  private val people = Seq(
    Row(1L, "Alice", "a@x.com", Row("ACorp", "a.com"), Seq("eng", "mgr")),
    Row(2L, "Bob", null, null, Seq.empty[String]))

  private def peopleDf = spark.createDataFrame(
    spark.sparkContext.parallelize(people), personSchema)

  test("encode → decode round-trips nested records, nulls, arrays") {
    val encoded = AvroCodec.encodeColumn(peopleDf, personSchema)
    assert(encoded.schema.head.dataType == BinaryType)
    val decoded = AvroCodec.decodeColumn(encoded, "value",
      personSchema, personSchema).collect().sortBy(_.getLong(0))
    assert(decoded.length == 2)
    assert(decoded(0).getAs[Row]("company").getString(0) == "ACorp")
    assert(decoded(0).getSeq[String](4).toSeq == Seq("eng", "mgr"))
    assert(decoded(1).isNullAt(2) && decoded(1).isNullAt(3))
  }

  test("sibling struct fields get distinct nested record names") {
    val st = StructType(Seq(
      StructField("a", StructType(Seq(StructField("x", IntegerType)))),
      StructField("b", StructType(Seq(StructField("y", StringType))))))
    // used to throw SchemaParseException: Can't redefine record_nested
    val avro = AvroCodec.toAvroSchema(st)
    assert(new org.apache.avro.Schema.Parser().parse(avro.toString) != null)
    val row = Row(Row(1), Row("s"))
    val bytes = AvroCodec.encode(row, avro)
    assert(AvroCodec.decode(bytes, avro, avro).get("a") != null)
  }

  test("arrays with null elements and short/NTZ columns round-trip") {
    val st = StructType(Seq(
      StructField("tags", ArrayType(StringType, containsNull = true)),
      StructField("sh", ShortType),
      StructField("t", TimestampNTZType)))
    val ldt = java.time.LocalDateTime.of(2024, 1, 15, 10, 30, 0)
    val df = spark.createDataFrame(
      java.util.List.of(Row(Seq("a", null, "b"), 7.toShort, ldt)), st)
    val back = AvroCodec.decodeColumn(
      AvroCodec.encodeColumn(df, st), "value", st, st).collect().head
    assert(back.getSeq[String](0) == Seq("a", null, "b"))
    assert(back.getShort(1) == 7.toShort)
    assert(back.getAs[java.time.LocalDateTime](2) == ldt)
  }

  test("schema resolution: new reader with nullable field reads old data") {
    val readerV2 = personSchema.add(
      StructField("nickname", StringType, nullable = true))
    // BACKWARD says v2 can read v1 data — verify it actually can.
    assert(SchemaCompat.isCompatible(personSchema, readerV2, SchemaCompat.Backward))
    val encoded = AvroCodec.encodeColumn(peopleDf, personSchema)
    val decoded = AvroCodec.decodeColumn(encoded, "value",
      personSchema, readerV2).collect().sortBy(_.getLong(0))
    assert(decoded(0).getString(1) == "Alice")
    assert(decoded(0).isNullAt(5)) // nickname defaults to null
  }

  test("schema resolution: reader that drops a field projects old data") {
    val readerSlim = StructType(personSchema.fields.filter(f =>
      f.name == "person_id" || f.name == "firstName"))
    val encoded = AvroCodec.encodeColumn(peopleDf, personSchema)
    val decoded = AvroCodec.decodeColumn(encoded, "value",
      personSchema, readerSlim).collect().sortBy(_.getLong(0))
    assert(decoded(0).schema.fieldNames.toSeq == Seq("person_id", "firstName"))
    assert(decoded(1).getString(1) == "Bob")
  }

  test("GraftSession builder carries the engine extensions") {
    // building on top of the existing session: just check it constructs and
    // the SQL fns registered by extensions exist in a fresh-session world
    val b = graft.core.GraftSession.builder(master = "local[2]",
      shufflePartitions = Some(2))
    assert(b != null)
  }
}
