package graft.schema

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Dynamic record access — the AUTO_CONSUME surface
  * (reference: client/api/schema/GenericRecord.java:31-63: getFields /
  * getField(name) against a schema known only at runtime; Schema.AUTO_CONSUME
  * Schema.java:417). A DataFrame row + its runtime StructType IS the
  * GenericRecord; this view adds the by-name navigation API, nested. */
class GenericRecordView(row: Row, schema: StructType) {

  def getFields: Seq[String] = schema.fieldNames.toSeq

  /** Field by name; nested structs come back as views, everything else as the
    * Spark-typed value (null-safe). */
  def getField(name: String): Any = {
    val idx = schema.fieldIndex(name)
    schema.fields(idx).dataType match {
      case st: StructType if !row.isNullAt(idx) =>
        new GenericRecordView(row.getStruct(idx), st)
      case _ => if (row.isNullAt(idx)) null else row.get(idx)
    }
  }

  /** Dotted-path navigation (`company.address.city`). */
  def getPath(path: String): Any =
    path.split('.').foldLeft(this: Any) {
      case (v: GenericRecordView, p) => v.getField(p)
      case (null, _) => null
      case (other, p) => throw new IllegalArgumentException(
        s"cannot navigate '$p' into non-record value $other")
    }
}

object GenericRecordView {
  def apply(row: Row): GenericRecordView =
    new GenericRecordView(row, row.schema)
}

/** Programmatic runtime schema construction — RecordSchemaBuilder /
  * FieldSchemaBuilder parity (reference: client/api/schema/
  * RecordSchemaBuilder.java, FieldSchemaBuilder.java: record(name)
  * .field(n).type(t).optional() → schema). Produces the StructType that
  * every other graft component consumes. */
class RecordSchemaBuilder(name: String) {
  private val fields = scala.collection.mutable.Buffer.empty[StructField]

  class FieldBuilder(fname: String) {
    private var dt: DataType = StringType
    private var nullable = false
    def `type`(t: DataType): FieldBuilder = { dt = t; this }
    def optional(): FieldBuilder = { nullable = true; this }
    def required(): FieldBuilder = { nullable = false; this }
    def end(): RecordSchemaBuilder = {
      fields += StructField(fname, dt, nullable)
      RecordSchemaBuilder.this
    }
  }

  def field(fname: String): FieldBuilder = new FieldBuilder(fname)
  def build(): StructType = StructType(fields.toSeq)
}

object RecordSchemaBuilder {
  def record(name: String): RecordSchemaBuilder = new RecordSchemaBuilder(name)
}
