package graft.sources.v2

import java.io.File

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport, GroupWriteSupport}
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation.stringType
import org.apache.parquet.schema.MessageType
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.parquet.schema.Types
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** Columnar (parquet) segment codec for the COLD tier: the offloader rewrites
  * sealed JSONL segments into parquet twins — the analog of the reference
  * offloader rewriting ledgers into its own block format (tiered-storage/
  * jcloud/.../BlobStoreManagedLedgerOffloader.java:95). The twin keeps the
  * segment's LOGICAL name (`segment-X.jsonl` → `segment-X.jsonl.parquet`,
  * [[TopicTable.logicalName]] strips the codec suffix), so frontiers,
  * families, and consumed-checks are oblivious to the codec; readers dispatch
  * on the physical extension. Cold reads stop re-parsing JSON on every scan,
  * and pruning can fall back to the parquet footer's column statistics when a
  * `.meta` sidecar is missing. */
object SegmentCodec {

  /** Physical suffix of a parquet-rewritten segment. A codec detail, never
    * part of the segment's identity. */
  val ColdExt = ".parquet"

  /** On-disk envelope, mirroring the JSONL field names (ms-epoch times). */
  val parquetSchema: MessageType = Types.buildMessage()
    .optional(BINARY).as(stringType).named("topic")
    .optional(INT32).named("partition")
    .optional(INT64).named("offset")
    .optional(BINARY).as(stringType).named("key")
    .optional(BINARY).as(stringType).named("value")
    .optional(INT64).named("event_time_ms")
    .optional(INT64).named("publish_time_ms")
    .optional(BINARY).as(stringType).named("producer_name")
    .optional(INT64).named("sequence_id")
    .optional(BINARY).as(stringType).named("replicated_from")
    .named("graft_segment")

  /** Rewrite one JSONL segment as its parquet twin, preserving row order.
    * Written to a dot-prefixed tmp (invisible to listers) then renamed, so a
    * concurrent reader never observes a partial file. */
  def rewriteToParquet(src: File, dst: File): Unit = {
    val mapper = new ObjectMapper()
    val gf = new SimpleGroupFactory(parquetSchema)
    val tmp = new File(dst.getParentFile, "." + dst.getName + ".tmp")
    tmp.delete()
    val conf = new Configuration()
    GroupWriteSupport.setSchema(parquetSchema, conf)
    // zstd: the cold tier is the 100 TB tier — storage footprint and read
    // I/O dominate there, and the vectorized reader decompresses pages
    // transparently either way
    val w = ExampleParquetWriter.builder(new Path(tmp.getAbsolutePath))
      .withConf(conf).withType(parquetSchema)
      .withCompressionCodec(
        org.apache.parquet.hadoop.metadata.CompressionCodecName.ZSTD)
      .build()
    try {
      val in = scala.io.Source.fromFile(src, "UTF-8")
      try in.getLines().foreach { line =>
        val n = mapper.readTree(line)
        val g = gf.newGroup()
        def str(k: String): Unit = {
          val v = n.get(k); if (v != null && !v.isNull) g.append(k, v.asText)
        }
        def i64(k: String): Unit = {
          val v = n.get(k); if (v != null && !v.isNull) g.append(k, v.asLong)
        }
        str("topic")
        val p = n.get("partition")
        if (p != null && !p.isNull) g.append("partition", p.asInt)
        i64("offset"); str("key"); str("value")
        i64("event_time_ms"); i64("publish_time_ms")
        str("producer_name"); i64("sequence_id"); str("replicated_from")
        w.write(g)
      } finally in.close()
    } finally w.close()
    if (dst.exists()) dst.delete()
    if (!tmp.renameTo(dst))
      throw new java.io.IOException(
        s"segment parquet rewrite: rename failed for $tmp -> $dst")
  }

  /** Pruning stats from the parquet FOOTER (row-group column statistics) —
    * the sidecar-less fallback for cold segments. Returns None for an empty
    * file (matches nothing, like an empty JSONL segment). When any required
    * statistic is missing the ranges degrade to ±∞ and the null count to
    * "unknown" (−1): pruning then keeps the segment and age-based
    * destruction refuses it — never the destructive direction. */
  def footerStats(f: File): Option[SegmentStats.Stats] =
    try {
      val pf = ParquetFileReader.open(HadoopInputFile.fromPath(
        new Path(f.getAbsolutePath), new Configuration()))
      try {
        val blocks = pf.getFooter.getBlocks.asScala
        if (blocks.map(_.getRowCount).sum == 0) None
        else {
          var minOff = Long.MaxValue; var maxOff = Long.MinValue
          var minPt = Long.MaxValue; var maxPt = Long.MinValue
          var nullPt = 0L
          var offOk = true; var ptOk = true
          blocks.foreach { b =>
            def col(name: String) = b.getColumns.asScala
              .find(_.getPath.toDotString == name)
            col("offset") match {
              case Some(cc) =>
                val st = cc.getStatistics
                if (st == null || st.isEmpty) offOk = false
                else if (st.hasNonNullValue) {
                  minOff = math.min(minOff,
                    st.genericGetMin.asInstanceOf[java.lang.Long])
                  maxOff = math.max(maxOff,
                    st.genericGetMax.asInstanceOf[java.lang.Long])
                }
              case None => offOk = false
            }
            col("publish_time_ms") match {
              case Some(cc) =>
                val st = cc.getStatistics
                if (st == null || st.isEmpty || !st.isNumNullsSet) ptOk = false
                else {
                  nullPt += st.getNumNulls
                  if (st.hasNonNullValue) {
                    minPt = math.min(minPt,
                      st.genericGetMin.asInstanceOf[java.lang.Long])
                    maxPt = math.max(maxPt,
                      st.genericGetMax.asInstanceOf[java.lang.Long])
                  }
                }
              case None => ptOk = false
            }
          }
          if (!offOk) { minOff = Long.MinValue; maxOff = Long.MaxValue }
          if (!ptOk) { minPt = Long.MinValue; maxPt = Long.MaxValue; nullPt = -1L }
          Some(SegmentStats.Stats(minOff, maxOff, minPt, maxPt, nullPt))
        }
      } finally pf.close()
    } catch { case _: Exception =>
      // unreadable footer: keep the segment visible to every predicate and
      // undatable for destruction
      Some(SegmentStats.Stats(Long.MinValue, Long.MaxValue,
        Long.MinValue, Long.MaxValue, -1L))
    }
}

/** Reads one parquet-rewritten segment; the pruned columns are pushed into
  * the parquet reader as a requested projection, so unrequested columns are
  * never decompressed or assembled — the columnar read the offload rewrite
  * exists for. The columnar twin of [[SegmentReader]]. */
class ParquetSegmentReader(file: String, required: StructType,
                           asOfMs: Option[Long] = None)
  extends PartitionReader[InternalRow] {
  // envelope column name → on-disk parquet field: shared with the
  // vectorized reader so the two cold readers can't drift
  private def diskField(name: String): String =
    ColumnarSegments.diskField(name)

  /** Fields actually present in THIS file: a legacy twin predating an
    * envelope column must null-fill it (the columnar reader's behavior),
    * not fail parquet's requested-schema containment check. */
  private val fileFields: Set[String] = {
    val pf = ParquetFileReader.open(HadoopInputFile.fromPath(
      new Path(file), new Configuration()))
    try pf.getFooter.getFileMetaData.getSchema.getFields.asScala
      .map(_.getName).toSet
    finally pf.close()
  }

  /** Disk fields in the read projection — lookups outside it (missing from
    * the file, or pruned) answer null / not-visible. */
  private val projectedFields: Set[String] = {
    // an AS OF read needs the publish stamp for visibility even when the
    // query projected it away
    val wanted = required.fields.map(f => diskField(f.name)).toSet ++
      (if (asOfMs.isDefined) Set("publish_time_ms") else Set.empty)
    wanted.intersect(fileFields)
  }

  private val reader = {
    val conf = new Configuration()
    val projected = SegmentCodec.parquetSchema.getFields.asScala
      .filter(f => projectedFields.contains(f.getName)).toList
    // an empty projection (count-only scan, or every wanted column absent
    // from the file) still needs one column to drive row iteration — use
    // the narrowest one the file has
    val fields =
      if (projected.nonEmpty) projected
      else SegmentCodec.parquetSchema.getFields.asScala
        .filter(f => fileFields.contains(f.getName)).take(1).toList
    conf.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
      new MessageType("graft_segment", fields.asJava).toString)
    ParquetReader.builder(new GroupReadSupport(), new Path(file))
      .withConf(conf).build()
  }
  private var row: InternalRow = _

  private def fieldValue(g: Group, name: String): Any = {
    def has(k: String) =
      projectedFields.contains(k) && g.getFieldRepetitionCount(k) > 0
    def str(k: String) =
      if (has(k)) UTF8String.fromString(g.getString(k, 0)) else null
    name match {
      case "topic" => str("topic")
      case "partition" =>
        if (has("partition")) g.getInteger("partition", 0) else null
      case "offset" => if (has("offset")) g.getLong("offset", 0) else null
      case "key" => str("key")
      case "value" => str("value")
      case "event_time" => // ms on disk → micros in the envelope
        if (has("event_time_ms")) g.getLong("event_time_ms", 0) * 1000L else null
      case "publish_time" =>
        if (has("publish_time_ms")) g.getLong("publish_time_ms", 0) * 1000L
        else null
      case "producer_name" => str("producer_name")
      case "sequence_id" =>
        if (has("sequence_id")) g.getLong("sequence_id", 0) else null
      case "replicated_from" => str("replicated_from")
    }
  }

  /** AS OF visibility (same contract as the JSONL reader): publish time
    * known and ≤ t — a file with no publish column at all has no provably
    * published rows. */
  private def visibleAt(g: Group): Boolean = asOfMs.forall { t =>
    projectedFields.contains("publish_time_ms") &&
      g.getFieldRepetitionCount("publish_time_ms") > 0 &&
      g.getLong("publish_time_ms", 0) <= t
  }

  override def next(): Boolean = {
    var g = reader.read()
    while (g != null && !visibleAt(g)) g = reader.read()
    if (g == null) false
    else {
      row = InternalRow.fromSeq(required.fields.toIndexedSeq
        .map(f => fieldValue(g, f.name)))
      true
    }
  }
  override def get(): InternalRow = row
  override def close(): Unit = reader.close()
}
