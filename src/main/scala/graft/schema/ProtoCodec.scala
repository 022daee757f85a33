package graft.schema

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Proto3 wire-format codec over Spark rows — the reference's PROTOBUF /
  * PROTOBUF_NATIVE schema types (Schema.PROTOBUF client/api/Schema.java:285;
  * compatibility checks ProtobufNativeSchemaCompatibilityCheck.java).
  *
  * Self-contained implementation of the proto3 encoding (varint, fixed32/64,
  * length-delimited; no protobuf-java dependency). Field numbers are the
  * StructType field positions + 1, so schema evolution is append-only —
  * exactly the discipline proto compatibility checking enforces. Proto3
  * semantics apply: default values (0, "", false, empty) are omitted on the
  * wire and absent fields decode to defaults, never null; unknown fields are
  * skipped (old readers tolerate new writers — FORWARD).
  */
object ProtoCodec {

  // ------------------------------------------------------------- primitives
  private def writeVarint(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v = v >>> 7
    }
    out.write(v.toInt)
  }

  private def writeTag(out: ByteArrayOutputStream, field: Int, wire: Int): Unit =
    writeVarint(out, ((field.toLong << 3) | wire))

  private class Reader(bytes: Array[Byte]) {
    var pos = 0
    def hasMore: Boolean = pos < bytes.length
    def varint(): Long = {
      var shift = 0; var result = 0L
      while (true) {
        val b = bytes(pos); pos += 1
        result |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
      }
      result
    }
    def fixed64(): Long = {
      val v = ByteBuffer.wrap(bytes, pos, 8).order(ByteOrder.LITTLE_ENDIAN).getLong
      pos += 8; v
    }
    def fixed32(): Int = {
      val v = ByteBuffer.wrap(bytes, pos, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
      pos += 4; v
    }
    def lenDelimited(): Array[Byte] = {
      val n = varint().toInt
      // copyOfRange would silently zero-pad past the buffer — corrupt input
      // must fail loudly instead
      if (n < 0 || pos + n > bytes.length)
        throw new IllegalArgumentException(
          s"corrupt length-delimited field: len=$n at offset $pos of ${bytes.length}")
      val v = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n; v
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => lenDelimited()
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"wire type $w")
    }
  }

  private def wireOf(dt: DataType): Int = dt match {
    case IntegerType | LongType | BooleanType | ShortType | ByteType => 0
    case DoubleType | TimestampType | TimestampNTZType => 1
    case FloatType => 5
    case StringType | BinaryType | _: StructType => 2
    case other => throw new IllegalArgumentException(s"proto type: $other")
  }

  // ------------------------------------------------------------------ encode
  /** `force` = repeated-element context: zeros are real elements there,
    * while singular defaults are omitted per proto3. */
  private def writeValue(out: ByteArrayOutputStream, field: Int, dt: DataType,
                         v: Any, force: Boolean = false): Unit = {
    if (v == null) return // proto3: absent ⇒ default
    dt match {
      case ArrayType(et, _) =>
        v.asInstanceOf[scala.collection.Seq[Any]]
          .foreach(e => writeValue(out, field, et, e, force = true)) // repeated
      case IntegerType | ShortType | ByteType =>
        val n = v.asInstanceOf[Number].longValue
        if (force || n != 0) { writeTag(out, field, 0); writeVarint(out, n) }
      case LongType =>
        val n = v.asInstanceOf[Long]
        if (force || n != 0) { writeTag(out, field, 0); writeVarint(out, n) }
      case BooleanType =>
        val bool = v.asInstanceOf[Boolean]
        if (force || bool) { writeTag(out, field, 0); writeVarint(out, if (bool) 1 else 0) }
      case DoubleType =>
        val d = v.asInstanceOf[Double]
        if (force || d != 0.0) {
          writeTag(out, field, 1)
          val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
            .putDouble(d).array()
          out.write(b, 0, 8)
        }
      case FloatType =>
        val f = v.asInstanceOf[Float]
        if (force || f != 0.0f) {
          writeTag(out, field, 5)
          val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
            .putFloat(f).array()
          out.write(b, 0, 4)
        }
      case StringType =>
        val s = v.toString
        if (force || s.nonEmpty) {
          writeTag(out, field, 2)
          val b = s.getBytes("UTF-8")
          writeVarint(out, b.length); out.write(b, 0, b.length)
        }
      case BinaryType =>
        val b = v.asInstanceOf[Array[Byte]]
        if (force || b.nonEmpty) {
          writeTag(out, field, 2)
          writeVarint(out, b.length); out.write(b, 0, b.length)
        }
      case st: StructType =>
        val nested = encode(v.asInstanceOf[Row], st)
        writeTag(out, field, 2)
        writeVarint(out, nested.length); out.write(nested, 0, nested.length)
      case TimestampType | TimestampNTZType =>
        val micros = v match {
          case t: java.sql.Timestamp => t.getTime * 1000L
          case l: java.time.LocalDateTime =>
            l.toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
        }
        if (force || micros != 0) {
          writeTag(out, field, 1)
          val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
            .putLong(micros).array()
          out.write(b, 0, 8)
        }
      case other => throw new IllegalArgumentException(s"proto type: $other")
    }
  }

  def encode(row: Row, schema: StructType): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      writeValue(out, i + 1, f.dataType, row.get(i))
    }
    out.toByteArray
  }

  // ------------------------------------------------------------------ decode
  private def defaultOf(dt: DataType): Any = dt match {
    case IntegerType => 0
    case LongType => 0L
    case BooleanType => false
    case DoubleType => 0.0
    case FloatType => 0.0f
    case StringType => ""
    case BinaryType => Array.empty[Byte]
    case st: StructType => null // absent message ⇒ null (proto3 messages)
    case ArrayType(_, _) => Seq.empty
    case TimestampType => new java.sql.Timestamp(0)
    case TimestampNTZType =>
      java.time.LocalDateTime.ofEpochSecond(0L, 0, java.time.ZoneOffset.UTC)
    case other => null
  }

  def decode(bytes: Array[Byte], schema: StructType): Row = {
    val values = new Array[Any](schema.length)
    val repeated = Array.fill(schema.length)(
      scala.collection.mutable.Buffer.empty[Any])
    val r = new Reader(bytes)
    while (r.hasMore) {
      val tag = r.varint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 0x7).toInt
      val idx = field - 1
      if (idx < 0 || idx >= schema.length) r.skip(wire) // unknown field
      else {
        val f = schema.fields(idx)
        val isRepeated = f.dataType.isInstanceOf[ArrayType]
        val elemType = f.dataType match {
          case ArrayType(et, _) => et
          case dt => dt
        }
        // packed repeated scalars (proto3 canonical): numeric repeated field
        // arriving as one length-delimited buffer of concatenated values
        val packedScalar = isRepeated && wire == 2 && (elemType match {
          case IntegerType | ShortType | ByteType | LongType | BooleanType |
               DoubleType | FloatType => true
          case _ => false
        })
        if (packedScalar) {
          val sub = new Reader(r.lenDelimited())
          while (sub.hasMore) {
            repeated(idx) += (elemType match {
              case IntegerType | ShortType | ByteType => sub.varint().toInt
              case LongType => sub.varint()
              case BooleanType => sub.varint() != 0
              case DoubleType => java.lang.Double.longBitsToDouble(sub.fixed64())
              case FloatType => java.lang.Float.intBitsToFloat(sub.fixed32())
            })
          }
        } else {
        val v: Any = elemType match {
          case IntegerType | ShortType | ByteType => r.varint().toInt
          case LongType => r.varint()
          case BooleanType => r.varint() != 0
          case DoubleType => java.lang.Double.longBitsToDouble(r.fixed64())
          case FloatType => java.lang.Float.intBitsToFloat(r.fixed32())
          case StringType => new String(r.lenDelimited(), "UTF-8")
          case BinaryType => r.lenDelimited()
          case st: StructType => decode(r.lenDelimited(), st)
          case TimestampType =>
            new java.sql.Timestamp(r.fixed64() / 1000L)
          case TimestampNTZType => // NTZ's external type is LocalDateTime
            val micros = r.fixed64()
            java.time.LocalDateTime.ofEpochSecond(
              Math.floorDiv(micros, 1000000L),
              (Math.floorMod(micros, 1000000L) * 1000L).toInt,
              java.time.ZoneOffset.UTC)
          case other => throw new IllegalArgumentException(
            s"unsupported datatype for proto decode: $other")
        }
        f.dataType match {
          case ArrayType(_, _) => repeated(idx) += v
          case _ => values(idx) = v
        }
        }
      }
    }
    Row.fromSeq(schema.fields.toIndexedSeq.zipWithIndex.map { case (f, i) =>
      f.dataType match {
        case ArrayType(_, _) => repeated(i).toSeq
        case _ => if (values(i) != null) values(i) else defaultOf(f.dataType)
      }
    })
  }

  // ------------------------------------------------------ DataFrame surface
  def encodeColumn(df: DataFrame, schema: StructType): DataFrame = {
    val cols = schema.fieldNames
    df.selectExpr(cols: _*)
      .mapPartitions(_.map(r => encode(r, schema)))(Encoders.BINARY)
      .toDF("value")
  }

  def decodeColumn(df: DataFrame, valueCol: String,
                   readerSchema: StructType): DataFrame =
    df.select(valueCol).mapPartitions(_.map(row =>
      decode(row.getAs[Array[Byte]](0), readerSchema)
    ))(Encoders.row(readerSchema))
}
