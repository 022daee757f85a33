package graft.sources.v2

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.column.{ColumnDescriptor, ColumnReader}
import org.apache.parquet.column.impl.ColumnReadStoreImpl
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.{Converter, GroupConverter, PrimitiveConverter}
import org.apache.parquet.schema.MessageType
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

/** Vectorized read path for topic segments: both codecs emit
  * [[ColumnarBatch]]es so the whole batch scan is columnar (Spark requires
  * all-or-nothing across a scan's partitions) and downstream operators run
  * against column vectors through whole-stage codegen's ColumnarToRow.
  *
  * The parquet reader is the point: instead of materializing one
  * parquet-mr `Group` object per row and re-dispatching on field names per
  * value (the old [[ParquetSegmentReader]] constant), it reads each
  * requested column's values straight into primitive
  * [[OnHeapColumnVector]]s via the public column API
  * (`ColumnReadStoreImpl`/`ColumnReader` — the same layer parquet's own
  * dump tooling reads through). Unrequested columns are never decompressed
  * (projection is pushed via `setRequestedSchema`), and a count-only scan
  * (empty projection) emits row counts from the footer without touching a
  * single page. This is the cold-tier analog of the reference offloader
  * existing to make cold reads cheap (tiered-storage/jcloud/.../
  * BlobStoreBackedReadHandleImpl.java — offloaded ledgers are read back
  * through an index, not re-parsed).
  */
object ColumnarSegments {
  /** Rows per emitted batch — Spark's own parquet reader default. */
  val BatchSize = 4096

  /** Envelope column name → on-disk parquet field (ms-epoch twins for the
    * timestamp columns). */
  def diskField(name: String): String = name match {
    case "event_time" => "event_time_ms"
    case "publish_time" => "publish_time_ms"
    case other => other
  }

  /** Inert converter tree: `ColumnReadStoreImpl` requires a converter for
    * dictionary-support probing, but values are pulled through the
    * `ColumnReader` getters, never pushed into the converter. */
  private[v2] object NoopRoot extends GroupConverter {
    private val prim = new PrimitiveConverter {}
    override def getConverter(i: Int): Converter = prim
    override def start(): Unit = ()
    override def end(): Unit = ()
  }
}

/** Reads one parquet cold segment as [[ColumnarBatch]]es, column-at-a-time
  * into vectors. Requested columns only; row-group at a time, sliced into
  * [[ColumnarSegments.BatchSize]]-row batches. */
class ParquetColumnarSegmentReader(file: String, required: StructType)
  extends PartitionReader[ColumnarBatch] {
  import ColumnarSegments._

  private val reader = ParquetFileReader.open(
    HadoopInputFile.fromPath(new Path(file), new Configuration()))
  private val createdBy = reader.getFooter.getFileMetaData.getCreatedBy

  private val requestedSchema: MessageType = {
    // intersect with the FILE's schema: a twin written before an envelope
    // column existed (the JSONL reader's "legacy rows" case) null-fills
    // that column instead of failing the projection
    val fileFields = reader.getFooter.getFileMetaData.getSchema
      .getFields.asScala.map(_.getName).toSet
    val wanted = required.fields.map(f => diskField(f.name)).toSet
    val projected = SegmentCodec.parquetSchema.getFields.asScala
      .filter(f => wanted.contains(f.getName) && fileFields.contains(f.getName))
      .toList
    new MessageType("graft_segment", projected.asJava)
  }
  if (requestedSchema.getFieldCount > 0)
    reader.setRequestedSchema(requestedSchema)

  /** Descriptor per required field, in output order; None → the column is
    * absent from this file and its vector is all-null. */
  private val descriptors: Array[Option[ColumnDescriptor]] =
    required.fields.map { f =>
      val dn = diskField(f.name)
      requestedSchema.getColumns.asScala.find(_.getPath()(0) == dn)
    }

  private val vectors: Array[OnHeapColumnVector] =
    required.fields.map(f => new OnHeapColumnVector(BatchSize, f.dataType))
  private val batch = new ColumnarBatch(vectors.toArray[ColumnVector])

  private var colReaders: Array[ColumnReader] = _
  private var rowsLeftInGroup = 0L

  // pageless scans (count-only, or every required column absent from this
  // file) never open a page: row counts come from the footer, vectors (if
  // any) are all-null
  private val pageless = requestedSchema.getFieldCount == 0
  private var pagelessRowsLeft: Long =
    if (pageless) reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
    else 0L

  override def next(): Boolean = {
    if (pageless) {
      if (pagelessRowsLeft <= 0L) return false
      val n = math.min(BatchSize.toLong, pagelessRowsLeft).toInt
      pagelessRowsLeft -= n
      var j = 0
      while (j < vectors.length) {
        vectors(j).reset(); vectors(j).putNulls(0, n); j += 1
      }
      batch.setNumRows(n)
      return true
    }
    while (rowsLeftInGroup <= 0L) {
      val pages = reader.readNextRowGroup()
      if (pages == null) return false
      rowsLeftInGroup = pages.getRowCount
      if (rowsLeftInGroup > 0L) {
        val store =
          new ColumnReadStoreImpl(pages, NoopRoot, requestedSchema, createdBy)
        colReaders = descriptors.map(_.map(store.getColumnReader).orNull)
      }
    }
    val n = math.min(BatchSize.toLong, rowsLeftInGroup).toInt
    var j = 0
    while (j < vectors.length) {
      val vec = vectors(j)
      vec.reset()
      if (descriptors(j).isEmpty) { // column absent from this file
        vec.putNulls(0, n)
      } else {
        val cr = colReaders(j)
        val maxDef = descriptors(j).get.getMaxDefinitionLevel
        required.fields(j).dataType match {
          case StringType =>
            var i = 0
            while (i < n) {
              if (cr.getCurrentDefinitionLevel == maxDef)
                vec.putByteArray(i, cr.getBinary.getBytes)
              else vec.putNull(i)
              cr.consume(); i += 1
            }
          case IntegerType =>
            var i = 0
            while (i < n) {
              if (cr.getCurrentDefinitionLevel == maxDef)
                vec.putInt(i, cr.getInteger)
              else vec.putNull(i)
              cr.consume(); i += 1
            }
          case LongType =>
            var i = 0
            while (i < n) {
              if (cr.getCurrentDefinitionLevel == maxDef)
                vec.putLong(i, cr.getLong)
              else vec.putNull(i)
              cr.consume(); i += 1
            }
          case TimestampType => // ms on disk → micros in the envelope
            var i = 0
            while (i < n) {
              if (cr.getCurrentDefinitionLevel == maxDef)
                vec.putLong(i, cr.getLong * 1000L)
              else vec.putNull(i)
              cr.consume(); i += 1
            }
          case dt =>
            throw new UnsupportedOperationException(
              s"segment envelope type $dt")
        }
      }
      j += 1
    }
    rowsLeftInGroup -= n
    batch.setNumRows(n)
    true
  }

  override def get(): ColumnarBatch = batch
  override def close(): Unit = {
    batch.close()
    reader.close()
  }
}

/** Batches any row-based segment reader (hot JSONL) into [[ColumnarBatch]]es
  * so hot and cold partitions present one columnar scan. The per-row vector
  * writes are noise next to the JSON parse the inner reader does. */
class RowBatchingSegmentReader(inner: PartitionReader[InternalRow],
                               required: StructType)
  extends PartitionReader[ColumnarBatch] {
  import ColumnarSegments._

  private val vectors: Array[OnHeapColumnVector] =
    required.fields.map(f => new OnHeapColumnVector(BatchSize, f.dataType))
  private val batch = new ColumnarBatch(vectors.toArray[ColumnVector])
  private var exhausted = false

  override def next(): Boolean = {
    if (exhausted) return false
    var j = 0
    while (j < vectors.length) { vectors(j).reset(); j += 1 }
    var n = 0
    while (n < BatchSize && !exhausted) {
      if (!inner.next()) exhausted = true
      else {
        val row = inner.get()
        var i = 0
        while (i < vectors.length) {
          if (row.isNullAt(i)) vectors(i).putNull(n)
          else required.fields(i).dataType match {
            case StringType =>
              vectors(i).putByteArray(n, row.getUTF8String(i).getBytes)
            case IntegerType => vectors(i).putInt(n, row.getInt(i))
            case LongType | TimestampType =>
              vectors(i).putLong(n, row.getLong(i))
            case dt =>
              throw new UnsupportedOperationException(
                s"segment envelope type $dt")
          }
          i += 1
        }
        n += 1
      }
    }
    if (n == 0) false
    else { batch.setNumRows(n); true }
  }

  override def get(): ColumnarBatch = batch
  override def close(): Unit = {
    batch.close()
    inner.close()
  }
}
