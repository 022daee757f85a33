package graft.schema

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Avro payload codec over Spark rows — the reference's primary typed-schema
  * wire format (Schema.AVRO, client/api/Schema.java:329; decode to
  * GenericRecord under AUTO_CONSUME, Schema.java:417). Built on avro-core
  * only: StructType ⇄ Avro record schema mapping plus binary
  * encode/decode, so payloads round-trip through the `value: binary`
  * envelope column and the [[SchemaRegistry]] gates schema evolution.
  */
object AvroCodec {

  /** StructType → Avro record schema (nullable fields become unions with
    * null, matching Avro's optional-field idiom the compatibility rules
    * reason about). Nested record names carry the FIELD PATH — sibling
    * structs would otherwise collide on one record fullname and Avro's
    * parser rejects the redefinition. Array/map element nullability maps to
    * element unions, so `Seq("a", null)` encodes instead of NPE-ing in the
    * datum writer. */
  def toAvroSchema(st: StructType, name: String = "record"): Schema = {
    def nullable(s: Schema): Schema =
      Schema.createUnion(Schema.create(Schema.Type.NULL), s)
    def fieldType(dt: DataType, path: String): Schema = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case TimestampType | TimestampNTZType => Schema.create(Schema.Type.LONG)
      case ArrayType(et, cn) =>
        val e = fieldType(et, path + "_item")
        Schema.createArray(if (cn) nullable(e) else e)
      case MapType(StringType, vt, vn) =>
        val v = fieldType(vt, path + "_value")
        Schema.createMap(if (vn) nullable(v) else v)
      case s: StructType => toAvroSchema(s, path)
      case other =>
        throw new IllegalArgumentException(s"unsupported avro type: $other")
    }
    val fields = st.fields.map { f =>
      val base = fieldType(f.dataType, name + "_" + f.name)
      val t = if (f.nullable) nullable(base) else base
      new Schema.Field(f.name, t,
        null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(name, null, "graft", false, fields.toList.asJava)
  }

  private def toAvroValue(v: Any, s: Schema): Any = {
    val resolved =
      if (s.getType == Schema.Type.UNION)
        s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
      else s
    v match {
      case null => null
      case r: Row =>
        val rec = new GenericData.Record(resolved)
        resolved.getFields.asScala.zipWithIndex.foreach { case (f, i) =>
          rec.put(f.name(), toAvroValue(r.get(i), f.schema()))
        }
        rec
      // collection.Seq, not the immutable.Seq alias: Spark rows hand back
      // mutable.ArraySeq for array columns
      case seq: scala.collection.Seq[_] =>
        seq.map(toAvroValue(_, resolved.getElementType)).asJava.asInstanceOf[AnyRef]
      case m: scala.collection.Map[_, _] =>
        m.map { case (k, mv) =>
          k.toString -> toAvroValue(mv, resolved.getValueType)
        }.asJava
      case ts: java.sql.Timestamp => ts.getTime * 1000L // micros
      case ldt: java.time.LocalDateTime => // TimestampNTZ external type
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          ldt.getNano / 1000L
      case s: java.lang.Short => s.intValue() // avro INT carries short/byte
      case b: java.lang.Byte => b.intValue()
      case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
      case other => other
    }
  }

  private def fromAvroValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (rec: GenericRecord, st: StructType) =>
      Row.fromSeq(st.fields.toIndexedSeq.map(f =>
        fromAvroValue(rec.get(f.name), f.dataType)))
    case (l: java.util.List[_], ArrayType(et, _)) =>
      l.asScala.toSeq.map(fromAvroValue(_, et))
    case (m: java.util.Map[_, _], MapType(_, vt, _)) =>
      m.asScala.map { case (k, mv) => k.toString -> fromAvroValue(mv, vt) }.toMap
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (micros: java.lang.Long, TimestampType) =>
      new java.sql.Timestamp(micros / 1000L)
    case (micros: java.lang.Long, TimestampNTZType) =>
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(micros.longValue(), 1000000L),
        (Math.floorMod(micros.longValue(), 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
    case (i: java.lang.Integer, ShortType) => i.shortValue()
    case (i: java.lang.Integer, ByteType) => i.byteValue()
    case (bb: java.nio.ByteBuffer, BinaryType) =>
      val arr = new Array[Byte](bb.remaining()); bb.get(arr); arr
    case (other, _) => other
  }

  def encode(row: Row, avroSchema: Schema): Array[Byte] = {
    val rec = toAvroValue(row, avroSchema).asInstanceOf[GenericRecord]
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](avroSchema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  /** Decode with distinct writer/reader schemas — Avro schema resolution, the
    * mechanism the BACKWARD/FORWARD rules in [[SchemaCompat]] protect. */
  def decode(bytes: Array[Byte], writer: Schema, reader: Schema): GenericRecord =
    new GenericDatumReader[GenericRecord](writer, reader)
      .read(null, DecoderFactory.get().binaryDecoder(bytes, null))

  /** Encode a DataFrame's columns into a single Avro `value` binary column
    * (the produce path: typed T → serialized payload). */
  def encodeColumn(df: DataFrame, schema: StructType): DataFrame = {
    val avroJson = toAvroSchema(schema).toString // Schema isn't serializable
    val cols = schema.fieldNames
    val enc = Encoders.BINARY
    val rows = df.selectExpr(cols: _*)
    rows.mapPartitions { it =>
      val avro = new Schema.Parser().parse(avroJson)
      it.map(r => encode(r, avro))
    }(enc).toDF("value")
  }

  /** Decode an Avro `value` binary column back to typed columns using a
    * reader schema (AUTO_CONSUME: registry-known writer schema, caller's
    * reader schema). */
  def decodeColumn(df: DataFrame, valueCol: String, writerSchema: StructType,
                   readerSchema: StructType): DataFrame = {
    val writerJson = toAvroSchema(writerSchema).toString
    val readerJson = toAvroSchema(readerSchema).toString
    val enc = Encoders.row(readerSchema)
    df.select(valueCol).mapPartitions { it =>
      val w = new Schema.Parser().parse(writerJson)
      val r = new Schema.Parser().parse(readerJson)
      it.map { row =>
        val rec = decode(row.getAs[Array[Byte]](0), w, r)
        fromAvroValue(rec, readerSchema).asInstanceOf[Row]
      }
    }(enc)
  }
}
