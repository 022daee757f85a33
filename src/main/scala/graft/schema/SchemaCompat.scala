package graft.schema

import org.apache.spark.sql.types._

/** Schema-registry compatibility checks over Spark StructTypes.
  *
  * Reference: the broker enforces per-format compatibility on every schema
  * update (SchemaRegistryServiceImpl.checkCompatible; Avro rules in
  * AvroSchemaCompatibilityCheck.java — BACKWARD = new schema can read data
  * written by the old, FORWARD = old can read new, FULL = both;
  * reference: pulsar-broker/.../service/schema/SchemaRegistryServiceImpl.java,
  * AvroSchemaCompatibilityCheck.java).
  *
  * Avro's resolution rules mapped to StructType:
  *  - a field present in reader but absent in writer needs a default
  *    (here: nullable) or the schemas are incompatible;
  *  - a field present in writer but absent in reader is ignored (projection);
  *  - shared fields must have promotable types (int→long, float→double, etc.)
  *    and compatible nested structs/arrays/maps.
  */
object SchemaCompat {

  sealed trait Mode
  case object AlwaysCompatible extends Mode
  case object Backward extends Mode
  case object Forward extends Mode
  case object Full extends Mode

  /** Numeric/temporal promotions Avro resolution allows (writer → reader). */
  private val promotions: Set[(DataType, DataType)] = Set(
    (IntegerType, LongType), (IntegerType, FloatType), (IntegerType, DoubleType),
    (LongType, FloatType), (LongType, DoubleType), (FloatType, DoubleType),
    (ShortType, IntegerType), (ShortType, LongType), (ByteType, ShortType),
    (ByteType, IntegerType), (ByteType, LongType),
    (StringType, BinaryType), (BinaryType, StringType),
    (TimestampNTZType, TimestampType))

  private def typeCanRead(writer: DataType, reader: DataType): List[String] =
    (writer, reader) match {
      case (w, r) if w == r => Nil
      case (w: StructType, r: StructType) => canReadErrors(w, r)
      case (w: ArrayType, r: ArrayType) =>
        // element nullability is part of the contract: writer data with null
        // elements must not flow into a reader promising none
        (if (w.containsNull && !r.containsNull)
          List("array elements: writer nullable but reader requires non-null")
        else Nil) ++ typeCanRead(w.elementType, r.elementType)
      case (w: MapType, r: MapType) =>
        (if (w.valueContainsNull && !r.valueContainsNull)
          List("map values: writer nullable but reader requires non-null")
        else Nil) ++
          typeCanRead(w.keyType, r.keyType) ++
          typeCanRead(w.valueType, r.valueType)
      case (w, r) if promotions((w, r)) => Nil
      case (w, r) => List(s"type ${w.simpleString} not readable as ${r.simpleString}")
    }

  /** Errors preventing `reader` from reading data written with `writer`. */
  def canReadErrors(writer: StructType, reader: StructType): List[String] = {
    val writerFields = writer.fields.map(f => f.name -> f).toMap
    reader.fields.toList.flatMap { rf =>
      writerFields.get(rf.name) match {
        case None if rf.nullable => Nil // missing in writer → null default
        case None => List(s"field ${rf.name}: absent in writer and not nullable")
        case Some(wf) =>
          val nullErr =
            if (wf.nullable && !rf.nullable)
              List(s"field ${rf.name}: writer nullable but reader requires non-null")
            else Nil
          nullErr ++ typeCanRead(wf.dataType, rf.dataType)
            .map(e => s"field ${rf.name}: $e")
      }
    }
  }

  def canRead(writer: StructType, reader: StructType): Boolean =
    canReadErrors(writer, reader).isEmpty

  /** Check a proposed new schema against the latest stored one under `mode` —
    * the pre-write gate the broker applies. Returns error list (empty = ok). */
  def check(oldSchema: StructType, newSchema: StructType, mode: Mode): List[String] =
    mode match {
      case AlwaysCompatible => Nil
      case Backward => canReadErrors(oldSchema, newSchema).map("BACKWARD: " + _)
      case Forward  => canReadErrors(newSchema, oldSchema).map("FORWARD: " + _)
      case Full =>
        canReadErrors(oldSchema, newSchema).map("BACKWARD: " + _) ++
          canReadErrors(newSchema, oldSchema).map("FORWARD: " + _)
    }

  def isCompatible(oldSchema: StructType, newSchema: StructType, mode: Mode): Boolean =
    check(oldSchema, newSchema, mode).isEmpty

  // ------------------------------------------------------------- per-format

  /** The reference gates each schema format with its own checker
    * (SchemaRegistryServiceImpl picks the check by SchemaType):
    * AvroSchemaCompatibilityCheck, JsonSchemaCompatibilityCheck (extends the
    * Avro check — JSON schemas are stored as Avro schemas, so resolution
    * rules are identical), ProtobufNativeSchemaCompatibilityCheck (wire-level
    * field-number rules), KeyValueSchemaCompatibilityCheck (key AND value
    * each gated independently with their own format). */
  sealed trait Format
  case object AvroFormat extends Format
  case object JsonFormat extends Format
  case object ProtoNativeFormat extends Format

  /** Proto wire-type family: within a family the bytes re-decode cleanly
    * (varint ints/bools; fixed64; fixed32; length-delimited). Identity on the
    * wire is the FIELD NUMBER (position here, as ProtoCodec assigns numbers
    * positionally), so renames are free but a wire-type change at the same
    * number breaks decoding — the rules of
    * ProtobufNativeSchemaCompatibilityCheck.java. */
  private def wireFamily(dt: DataType): String = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType => "varint"
    case DoubleType | TimestampType | TimestampNTZType => "fixed64"
    case FloatType => "fixed32"
    case StringType | BinaryType => "len"
    case _ => "unsupported"
  }

  private def protoTypeErrors(w: DataType, r: DataType, num: Int): List[String] =
    (w, r) match {
      case (ws: StructType, rs: StructType) =>
        protoReadErrors(ws, rs).map(e => s"field $num: $e")
      case (ArrayType(we, _), ArrayType(re, _)) => protoTypeErrors(we, re, num)
      case (_: StructType, _) | (_, _: StructType) |
           (_: ArrayType, _) | (_, _: ArrayType) =>
        List(s"field $num: message/repeated shape changed " +
          s"(${w.simpleString} -> ${r.simpleString})")
      case _ if wireFamily(w) == wireFamily(r) && wireFamily(w) != "unsupported" =>
        Nil
      case _ =>
        List(s"field $num: wire type ${w.simpleString} -> ${r.simpleString} " +
          "breaks decoding")
    }

  /** Errors preventing a proto `reader` schema from decoding bytes written
    * with `writer`: same field number must keep a wire-compatible type (a
    * RENAME at the same number is legal — numbers are identity in proto);
    * new trailing numbers default; removed trailing numbers are skipped as
    * unknown. Because this codec derives field numbers from POSITION, a
    * MIDDLE add/remove renumbers every later field — which often decodes
    * cleanly (neighbors share a wire family) while routing every subsequent
    * value into the wrong column — and an equal-count change (middle drop
    * plus trailing add) is just as misrouting as one that changes arity.
    * The shift detector therefore runs at EVERY arity and is name-based: a
    * name mismatch at one position is accepted as a rename only when the
    * name is NEW on its side AND the field count is unchanged; a name that
    * also exists at another position of the other schema is evidence of a
    * positional shift, and a rename COMBINED with an arity change is
    * rejected as ambiguous UNLESS a later shared position still matches
    * exactly (an anchor): writer (a,b,c) → reader (a,b2,c,d) is a safe
    * rename — the anchored `c` contradicts any shift through position 2 —
    * but writer (a,b,c) → reader (a,X) reads equally as "rename b→X, drop
    * trailing c" (safe) and "drop middle b, rename c→X" (silently
    * re-routes b's values into X), and names alone cannot tell them apart.
    * (Heuristic: an equal-arity shift that renames every shifted field is
    * still undetectable — positional codecs cannot do better without
    * persisted field numbers.) */
  def protoReadErrors(writer: StructType, reader: StructType): List[String] = {
    val shared = math.min(writer.fields.length, reader.fields.length)
    val writerNames = writer.fields.map(_.name).toSet
    val readerNames = reader.fields.map(_.name).toSet
    val alignErr = (0 until shared).toList.flatMap { i =>
      val wn = writer.fields(i).name; val rn = reader.fields(i).name
      if (wn != rn && (writerNames.contains(rn) || readerNames.contains(wn)))
        List(s"field ${i + 1}: name '$wn' -> '$rn' is a positional shift " +
          "(the name exists at another field number) — a non-trailing " +
          "add/remove renumbers later fields and silently re-routes their " +
          "values")
      else if (wn != rn && writer.fields.length != reader.fields.length &&
        !((i + 1) until shared).exists(j =>
          writer.fields(j).name == reader.fields(j).name))
        List(s"field ${i + 1}: name '$wn' -> '$rn' combined with a field " +
          "count change and no later matching position is ambiguous — it " +
          "reads equally as a rename plus trailing add/remove (safe) and " +
          "as a middle add/remove that re-routes later values; rename and " +
          "add/remove in separate steps")
      else Nil
    }
    alignErr ++ reader.fields.toList.zipWithIndex.flatMap { case (rf, i) =>
      if (i >= writer.fields.length) Nil // new field number → proto default
      else protoTypeErrors(writer.fields(i).dataType, rf.dataType, i + 1)
    }
  }

  def readErrors(format: Format, writer: StructType,
                 reader: StructType): List[String] = format match {
    case AvroFormat | JsonFormat => canReadErrors(writer, reader)
    case ProtoNativeFormat => protoReadErrors(writer, reader)
  }

  /** The pre-write gate with the format's own rules. */
  def checkFormat(format: Format, oldSchema: StructType, newSchema: StructType,
                  mode: Mode): List[String] = mode match {
    case AlwaysCompatible => Nil
    case Backward => readErrors(format, oldSchema, newSchema).map("BACKWARD: " + _)
    case Forward  => readErrors(format, newSchema, oldSchema).map("FORWARD: " + _)
    case Full =>
      readErrors(format, oldSchema, newSchema).map("BACKWARD: " + _) ++
        readErrors(format, newSchema, oldSchema).map("FORWARD: " + _)
  }

  /** KeyValue schema: each side carries its own format and is gated
    * INDEPENDENTLY — both must pass (KeyValueSchemaCompatibilityCheck.java);
    * changing a side's format is always a break. */
  case class KeyValueSchema(keyFormat: Format, key: StructType,
                            valueFormat: Format, value: StructType)

  def checkKeyValue(oldSchema: KeyValueSchema, newSchema: KeyValueSchema,
                    mode: Mode): List[String] = {
    val keyErrs =
      if (oldSchema.keyFormat != newSchema.keyFormat)
        List(s"key: format changed ${oldSchema.keyFormat} -> ${newSchema.keyFormat}")
      else checkFormat(newSchema.keyFormat, oldSchema.key, newSchema.key, mode)
        .map("key: " + _)
    val valErrs =
      if (oldSchema.valueFormat != newSchema.valueFormat)
        List(s"value: format changed ${oldSchema.valueFormat} -> ${newSchema.valueFormat}")
      else checkFormat(newSchema.valueFormat, oldSchema.value, newSchema.value, mode)
        .map("value: " + _)
    keyErrs ++ valErrs
  }
}

/** A tiny versioned schema catalog: the registry's storage surface
  * (reference: BookkeeperSchemaStorage — versioned put/get; here an in-memory
  * map suitable for session lifetime; persistence = a table property in a
  * real deployment). [[decodeAuto]] is the AUTO_CONSUME read path: each
  * message decoded with ITS writer schema version, presented as the latest
  * view. */
class SchemaRegistry(mode: SchemaCompat.Mode,
                     format: SchemaCompat.Format = SchemaCompat.AvroFormat) {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.functions._

  /** AUTO_CONSUME decode (reference: Schema.AUTO_CONSUME() Schema.java:417
    * decodes to GenericRecord using the server-side registry + the message's
    * schemaVersion Message.java:209): each row's JSON payload is parsed with
    * the schema version stamped on the message, then resolved up to the
    * LATEST registered schema — fields the writer lacked become null (the
    * Avro default rule), shared fields promote (int→long etc). One
    * `coalesce(when(version==v, …))` projection, fully codegen'd. */
  def decodeAuto(df: DataFrame, subject: String, valueCol: String,
                 versionCol: String): DataFrame = {
    val vs = versions(subject)
    require(vs.nonEmpty, s"no schema registered for $subject")
    val latest = vs.last
    def upcast(dec: Column, from: StructType): Column =
      struct(latest.fields.toIndexedSeq.map { f =>
        if (from.fieldNames.contains(f.name))
          dec.getField(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }: _*)
    // a version stamp outside the registered range RAISES (the reference's
    // registry lookup fails on an unknown schemaVersion) rather than letting
    // a silent null flow into downstream aggregations
    val unknown = upcast(from_json(
      raise_error(concat(lit(s"unknown schema version for '$subject': "),
        col(versionCol).cast("string"))).cast("string"), latest), latest)
    val resolved = coalesce(vs.zipWithIndex.map { case (sch, v) =>
      when(col(versionCol) === lit(v),
        upcast(from_json(col(valueCol), sch), sch))
    } :+ unknown: _*)
    df.withColumn("decoded", resolved)
  }
  private val store =
    scala.collection.mutable.Map.empty[String, Vector[StructType]]

  def latest(subject: String): Option[StructType] =
    synchronized { store.get(subject).flatMap(_.lastOption) }

  def versions(subject: String): Vector[StructType] =
    synchronized { store.getOrElse(subject, Vector.empty) }

  /** Register a new version after the compatibility gate — with the
    * registry's FORMAT-specific rules (the reference picks the checker by
    * SchemaType; gating a proto subject with Avro's by-name rules would
    * admit positionally-breaking changes). Returns the new version number
    * or the violation list. */
  def register(subject: String, schema: StructType): Either[List[String], Int] =
    synchronized {
      store.get(subject).flatMap(_.lastOption) match {
        case Some(old) =>
          val errs = SchemaCompat.checkFormat(format, old, schema, mode)
          if (errs.nonEmpty) Left(errs)
          else {
            store(subject) = store(subject) :+ schema
            Right(store(subject).size - 1)
          }
        case None =>
          store(subject) = Vector(schema)
          Right(0)
      }
    }
}
