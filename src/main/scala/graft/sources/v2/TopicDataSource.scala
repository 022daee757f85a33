package graft.sources.v2

import java.io.File
import java.util.UUID

import scala.collection.JavaConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.JsonNodeFactory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, EqualTo}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A Pulsar-like topic as a custom DSv2 source/sink — the "Structured
  * Streaming + custom source" north star.
  *
  * Storage model: a topic is a directory of immutable, append-only JSON-line
  * segment files (`segment-*.jsonl`) — the managed-ledger analog (a ledger is
  * sealed once written; reference: managed-ledger/.../ManagedLedgerImpl.java:767-794).
  *
  * Read paths:
  *  - batch scan = Reader from earliest to latest (Reader.java:148-174), with
  *    pushed filters on `offset`/`publish_time` used to PRUNE whole segments
  *    via a per-segment min/max footer — the seek-by-timestamp binary search
  *    (PersistentMessageFinder.java:57-64) and compacted-topic findStartPoint
  *    (CompactedTopicImpl.java:169-197) as DSv2 pruning. Column pruning is
  *    pushed into the row parser.
  *  - micro-batch stream = Consumer subscribe (ConsumerImpl): offsets count
  *    whole segments (segments are sealed), checkpoint-committed like a
  *    cursor markDelete.
  *
  * Write paths: batch append and streaming epoch writes. Streaming segment
  * names embed (epochId, partitionId), so a replayed epoch overwrites the
  * same files — idempotent, the effectively-once produce guarantee
  * (FunctionConfig.EFFECTIVELY_ONCE analog).
  */
class TopicDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-topic"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TopicTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new TopicTable(properties.get("path"))
}

object TopicTable {
  /** Envelope subset persisted per message (ms-epoch times on disk). */
  val schema: StructType = StructType(Seq(
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("key", StringType),
    StructField("value", StringType),
    StructField("event_time", TimestampType),
    StructField("publish_time", TimestampType),
    StructField("producer_name", StringType),
    StructField("sequence_id", LongType)))

  def listSegments(dir: String): Array[File] = {
    val d = new File(dir)
    if (!d.exists()) Array.empty
    else d.listFiles((_, n) => n.startsWith("segment-") && n.endsWith(".jsonl"))
      .sortBy(_.getName)
  }
}

class TopicTable(path: String) extends Table with SupportsRead with SupportsWrite {
  require(path != null, "graft-topic requires .option(\"path\", dir)")
  override def name(): String = s"graft-topic:$path"
  override def schema(): StructType = TopicTable.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TopicScanBuilder(path,
      Option(options.get("maxSegmentsPerTrigger")).map(_.toInt),
      Option(options.get("startingTime")).map(_.toLong))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new TopicWriteBuilder(path, info.queryId())
}

// ---------------------------------------------------------------------- read

class TopicScanBuilder(path: String, maxSegmentsPerTrigger: Option[Int] = None,
                       startingTimeMs: Option[Long] = None) extends ScanBuilder
  with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = TopicTable.schema

  /** Accept offset/publish_time range filters for segment pruning; report all
    * filters as residual so Spark re-applies them exactly. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case GreaterThan(a, _) => a == "offset" || a == "publish_time"
      case GreaterThanOrEqual(a, _) => a == "offset" || a == "publish_time"
      case LessThan(a, _) => a == "offset" || a == "publish_time"
      case LessThanOrEqual(a, _) => a == "offset" || a == "publish_time"
      case EqualTo(a, _) => a == "offset"
      case _ => false
    }
    filters // residual: source prunes segments, Spark verifies rows
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new TopicScan(path, pushed, required, maxSegmentsPerTrigger, startingTimeMs)
}

class TopicScan(path: String, filters: Array[Filter], required: StructType,
                maxSegmentsPerTrigger: Option[Int] = None,
                startingTimeMs: Option[Long] = None)
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new TopicMicroBatchStream(path, maxSegmentsPerTrigger, startingTimeMs)
  override def description(): String =
    s"GraftTopicScan(path=$path, prunedBy=${filters.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    val segs = TopicTable.listSegments(path)
    segs.filter(f => SegmentStats.mightMatch(f, filters))
      .map(f => TopicInputPartition(f.getAbsolutePath): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new TopicReaderFactory(required)
}

case class TopicInputPartition(file: String) extends InputPartition

/** Per-segment min/max offset & publish_time — the pruning "footer".
  * Preferred source is the `.meta` sidecar the writer drops at commit (so
  * pruning is pure metadata, never a data read); fallback scans the
  * segment's first/last lines (segments are written in offset order). */
object SegmentStats {
  private val mapper = new ObjectMapper()

  case class Stats(minOff: Long, maxOff: Long, minPt: Long, maxPt: Long)

  def sidecarFor(segment: File): File =
    new File(segment.getParentFile, segment.getName + ".meta")

  def writeSidecar(segment: File, s: Stats): Unit = {
    val nf = JsonNodeFactory.instance
    val o = nf.objectNode()
    o.put("min_offset", s.minOff); o.put("max_offset", s.maxOff)
    o.put("min_publish_time_ms", s.minPt); o.put("max_publish_time_ms", s.maxPt)
    java.nio.file.Files.write(sidecarFor(segment).toPath,
      o.toString.getBytes("UTF-8"))
  }

  private def readStats(f: File): Option[Stats] = {
    val side = sidecarFor(f)
    if (side.exists()) {
      val n = mapper.readTree(new String(
        java.nio.file.Files.readAllBytes(side.toPath), "UTF-8"))
      Some(Stats(n.get("min_offset").asLong, n.get("max_offset").asLong,
        n.get("min_publish_time_ms").asLong, n.get("max_publish_time_ms").asLong))
    } else {
      // fallback: scan first/last line of the segment
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try {
        val lines = src.getLines()
        if (!lines.hasNext) None
        else {
          val firstLine = lines.next()
          var lastLine = firstLine
          while (lines.hasNext) lastLine = lines.next()
          val first = mapper.readTree(firstLine)
          val last = mapper.readTree(lastLine)
          Some(Stats(first.get("offset").asLong, last.get("offset").asLong,
            first.get("publish_time_ms").asLong,
            last.get("publish_time_ms").asLong))
        }
      } finally src.close()
    }
  }

  def mightMatch(f: File, filters: Array[Filter]): Boolean = {
    if (filters.isEmpty) return true
    readStats(f) match {
      case None => false // empty segment matches nothing
      case Some(Stats(minOff, maxOff, minPt, maxPt)) =>
      def ms(v: Any): Long = v match {
        case t: java.sql.Timestamp => t.getTime
        case i: java.time.Instant => i.toEpochMilli
        case other => other.toString.toLong
      }
      filters.forall {
        case GreaterThan("offset", v: Long) => maxOff > v
        case GreaterThanOrEqual("offset", v: Long) => maxOff >= v
        case LessThan("offset", v: Long) => minOff < v
        case LessThanOrEqual("offset", v: Long) => minOff <= v
        case EqualTo("offset", v: Long) => minOff <= v && v <= maxOff
        case GreaterThan("publish_time", v) => maxPt > ms(v)
        case GreaterThanOrEqual("publish_time", v) => maxPt >= ms(v)
        case LessThan("publish_time", v) => minPt < ms(v)
        case LessThanOrEqual("publish_time", v) => minPt <= ms(v)
        case _ => true
      }
    }
  }
}

class TopicReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new SegmentReader(p.asInstanceOf[TopicInputPartition].file, required)
}

/** Parses one segment; projects only the pruned columns into InternalRows. */
class SegmentReader(file: String, required: StructType)
  extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private val src = scala.io.Source.fromFile(file, "UTF-8")
  private val lines = src.getLines()
  private var row: InternalRow = _

  private def fieldValue(node: JsonNode, name: String): Any = {
    def str(k: String) = {
      val n = node.get(k)
      if (n == null || n.isNull) null else UTF8String.fromString(n.asText)
    }
    name match {
      case "topic" => str("topic")
      case "partition" => node.get("partition").asInt
      case "offset" => node.get("offset").asLong
      case "key" => str("key")
      case "value" => str("value")
      case "event_time" => node.get("event_time_ms").asLong * 1000L
      case "publish_time" => node.get("publish_time_ms").asLong * 1000L
      case "producer_name" => str("producer_name")
      case "sequence_id" => node.get("sequence_id").asLong
    }
  }

  override def next(): Boolean = {
    if (!lines.hasNext) return false
    val node = mapper.readTree(lines.next())
    row = InternalRow.fromSeq(required.fields.toIndexedSeq
      .map(f => fieldValue(node, f.name)))
    true
  }
  override def get(): InternalRow = row
  override def close(): Unit = src.close()
}

// ----------------------------------------------------------- streaming read

/** Stream offset = the set of sealed segments consumed so far. Segments are
  * immutable once written (closed ledgers), but NEW segment names may sort
  * anywhere, so the offset must name what was read rather than count it. */
case class SegmentSetOffset(segments: Set[String]) extends Offset {
  override def json(): String = {
    val nf = JsonNodeFactory.instance
    val arr = nf.arrayNode()
    segments.toSeq.sorted.foreach(arr.add)
    nf.objectNode().set[JsonNode]("segments", arr).toString
  }
}

class TopicMicroBatchStream(path: String,
                            maxSegmentsPerTrigger: Option[Int] = None,
                            startingTimeMs: Option[Long] = None)
  extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.ReadLimit
  private val mapper = new ObjectMapper()

  /** `startingTime` seek: segments wholly before the timestamp start out
    * consumed — the subscribe-from-timestamp cursor position
    * (PersistentMessageFinder.java:57-64 as an initial-offset rule). */
  override def initialOffset(): Offset = startingTimeMs match {
    case None => SegmentSetOffset(Set.empty)
    case Some(ts) =>
      val skipped = TopicTable.listSegments(path).filter { f =>
        !SegmentStats.mightMatch(f,
          Array(GreaterThanOrEqual("publish_time",
            new java.sql.Timestamp(ts)): Filter))
      }
      SegmentSetOffset(skipped.map(_.getName).toSet)
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  /** Batch-receive pacing (BatchReceivePolicy.maxNumMessages analog at
    * segment granularity): admit at most maxSegmentsPerTrigger new sealed
    * segments per micro-batch. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val consumed = start.asInstanceOf[SegmentSetOffset].segments
    val unconsumed = TopicTable.listSegments(path).map(_.getName)
      .filterNot(consumed.contains).sorted
    val admitted = maxSegmentsPerTrigger match {
      case Some(n) => unconsumed.take(n)
      case None => unconsumed
    }
    SegmentSetOffset(consumed ++ admitted)
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def deserializeOffset(json: String): Offset =
    SegmentSetOffset(mapper.readTree(json).get("segments").elements().asScala
      .map(_.asText).toSet)
  override def commit(end: Offset): Unit = () // cursor markDelete analog
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SegmentSetOffset].segments
    val e = end.asInstanceOf[SegmentSetOffset].segments
    TopicTable.listSegments(path)
      .filter(f => e.contains(f.getName) && !s.contains(f.getName))
      .map(f => TopicInputPartition(f.getAbsolutePath): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new TopicReaderFactory(TopicTable.schema)
}

// --------------------------------------------------------------------- write

class TopicWriteBuilder(path: String, queryId: String) extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new TopicBatchWrite(path, queryId)
    override def toStreaming: StreamingWrite = new TopicStreamingWrite(path, queryId)
  }
}

case class SegmentCommit(file: String) extends WriterCommitMessage

class TopicBatchWrite(path: String, queryId: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new TopicWriterFactory(path, s"b-$queryId")
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case SegmentCommit(f) =>
      new File(f).delete(); SegmentStats.sidecarFor(new File(f)).delete()
    }
}

class TopicStreamingWrite(path: String, queryId: String) extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new TopicStreamWriterFactory(path, queryId)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case SegmentCommit(f) =>
      new File(f).delete(); SegmentStats.sidecarFor(new File(f)).delete()
    }
}

class TopicWriterFactory(path: String, prefix: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new SegmentWriter(path, f"segment-$prefix-p$partitionId%05d.jsonl")
}

class TopicStreamWriterFactory(path: String, queryId: String)
  extends StreamingDataWriterFactory {
  /** Epoch in the name ⇒ replaying an epoch rewrites the same file —
    * idempotent streaming produce (effectively-once). */
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new SegmentWriter(path, f"segment-e$epochId%010d-p$partitionId%05d.jsonl")
}

class SegmentWriter(dir: String, name: String) extends DataWriter[InternalRow] {
  new File(dir).mkdirs()
  private val tmp = new File(dir, s".$name.${UUID.randomUUID()}.tmp")
  private val out = new java.io.PrintWriter(
    new java.io.OutputStreamWriter(new java.io.FileOutputStream(tmp), "UTF-8"))
  private val nf = JsonNodeFactory.instance
  // pruning-footer stats tracked as rows stream through
  private var n = 0L
  private var minOff = Long.MaxValue; private var maxOff = Long.MinValue
  private var minPt = Long.MaxValue; private var maxPt = Long.MinValue

  override def write(r: InternalRow): Unit = {
    n += 1
    val off = r.getLong(2)
    minOff = math.min(minOff, off); maxOff = math.max(maxOff, off)
    val pt = if (r.isNullAt(6)) 0L else r.getLong(6) / 1000L
    minPt = math.min(minPt, pt); maxPt = math.max(maxPt, pt)
    val o = nf.objectNode()
    def s(i: Int, k: String): Unit =
      if (r.isNullAt(i)) o.putNull(k) else o.put(k, r.getUTF8String(i).toString)
    s(0, "topic")
    o.put("partition", if (r.isNullAt(1)) 0 else r.getInt(1))
    o.put("offset", r.getLong(2))
    s(3, "key"); s(4, "value")
    o.put("event_time_ms", if (r.isNullAt(5)) 0L else r.getLong(5) / 1000L)
    o.put("publish_time_ms", if (r.isNullAt(6)) 0L else r.getLong(6) / 1000L)
    s(7, "producer_name")
    o.put("sequence_id", if (r.isNullAt(8)) 0L else r.getLong(8))
    out.println(o.toString)
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    val dst = new File(dir, name)
    if (dst.exists()) dst.delete() // idempotent epoch replay
    tmp.renameTo(dst)
    if (n > 0) // sidecar written AFTER the segment: readers always fall back
      SegmentStats.writeSidecar(dst,
        SegmentStats.Stats(minOff, maxOff, minPt, maxPt))
    SegmentCommit(dst.getAbsolutePath)
  }
  override def abort(): Unit = { out.close(); tmp.delete() }
  override def close(): Unit = ()
}
