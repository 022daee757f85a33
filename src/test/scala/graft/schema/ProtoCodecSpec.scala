package graft.schema

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class ProtoCodecSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true),
    StructField("flags", ArrayType(IntegerType), nullable = true),
    StructField("inner", StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType))),
      nullable = true)))

  test("proto3 round-trip: scalars, repeated, nested message") {
    val row = Row(42L, "hello", 2.5, Seq(1, 0, 7), Row(9, "x"))
    val decoded = ProtoCodec.decode(ProtoCodec.encode(row, schema), schema)
    assert(decoded.getLong(0) == 42L)
    assert(decoded.getString(1) == "hello")
    assert(decoded.getDouble(2) == 2.5)
    assert(decoded.getSeq[Int](3).toList == List(1, 0, 7))
    assert(decoded.getStruct(4) == Row(9, "x"))
  }

  test("proto3 defaults: absent fields decode to zero values, not null") {
    val row = Row(0L, null, null, null, null)
    val bytes = ProtoCodec.encode(row, schema)
    assert(bytes.isEmpty) // all defaults ⇒ empty message
    val decoded = ProtoCodec.decode(bytes, schema)
    assert(decoded.getLong(0) == 0L && decoded.getString(1) == "")
    assert(decoded.getDouble(2) == 0.0)
    assert(decoded.getSeq[Int](3).isEmpty)
    assert(decoded.isNullAt(4)) // absent nested message IS null in proto3
  }

  test("schema evolution: old reader skips appended fields (FORWARD)") {
    val v2 = schema.add(StructField("extra", StringType, nullable = true))
    val row = Row(7L, "n", 1.0, Seq(3), Row(1, "y"), "new-field")
    val bytes = ProtoCodec.encode(row, v2)
    val old = ProtoCodec.decode(bytes, schema) // v1 reader
    assert(old.getLong(0) == 7L && old.getString(1) == "n")
    // and a v2 reader of v1 data gets the default (BACKWARD)
    val v1bytes = ProtoCodec.encode(Row(7L, "n", 1.0, Seq(3), Row(1, "y")), schema)
    assert(ProtoCodec.decode(v1bytes, v2).getString(5) == "")
  }

  test("decoder accepts packed repeated scalars (canonical proto3 writers)") {
    // hand-encode field 4 (flags: repeated int32) PACKED: tag wire=2, then
    // a length-delimited buffer of varints [1, 0, 7]
    val out = new java.io.ByteArrayOutputStream()
    out.write((4 << 3) | 2) // field 4, wire 2
    out.write(3)            // payload length
    out.write(1); out.write(0); out.write(7)
    val decoded = ProtoCodec.decode(out.toByteArray, schema)
    assert(decoded.getSeq[Int](3).toList == List(1, 0, 7))
  }

  test("negative and large varints survive") {
    val s = StructType(Seq(StructField("x", LongType), StructField("y", IntegerType)))
    for ((x, y) <- Seq((-1L, -2), (Long.MaxValue, Int.MaxValue),
      (Long.MinValue, Int.MinValue), (0L, 0))) {
      val d = ProtoCodec.decode(ProtoCodec.encode(Row(x, y), s), s)
      assert(d.getLong(0) == x && d.getInt(1) == y, s"($x,$y)")
    }
  }

  test("DataFrame encode/decode columns round-trip") {
    import spark.implicits._
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, "a", 0.5, Seq(1), Row(2, "b")),
      Row(2L, "c", 1.5, Seq.empty[Int], null))), schema)
    val enc = ProtoCodec.encodeColumn(df, schema)
    val dec = ProtoCodec.decodeColumn(enc, "value", schema)
      .collect().sortBy(_.getLong(0))
    assert(dec(0).getString(1) == "a" && dec(1).getString(1) == "c")
    assert(dec(1).isNullAt(4))
  }
}
