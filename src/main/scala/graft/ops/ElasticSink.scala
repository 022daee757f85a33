package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ElasticSearch sink surface — the document mapping of the reference's ES
  * connector (reference: pulsar-io/elastic-search/.../ElasticSearchSink.java —
  * JSON doc per record, _id from the message key;  JsonConverter.java;
  * date-pattern index routing IndexNameFormatter.java:36-41:
  * `logs-%{+yyyy-MM-dd}` substitutes the event time).
  *
  * The mapping (index name, _id, document JSON, bulk payload) is pure and
  * unit-tested; the HTTP transport is a `foreachBatch` caller's plug-in —
  * same split as the JDBC sink (set-based payload handed to an executor).
  */
object ElasticSink {

  private val PatternRx = """%\{\+([^}]+)\}""".r

  /** Index-name column from a date pattern: every `%{+fmt}` segment becomes
    * `date_format(eventTime, fmt)`, literals pass through. */
  def indexName(pattern: String, eventTime: Column): Column = {
    val parts = scala.collection.mutable.Buffer.empty[Column]
    var last = 0
    for (m <- PatternRx.findAllMatchIn(pattern)) {
      if (m.start > last) parts += lit(pattern.substring(last, m.start))
      parts += date_format(eventTime, m.group(1))
      last = m.end
    }
    if (last < pattern.length) parts += lit(pattern.substring(last))
    if (parts.isEmpty) lit(pattern) else concat(parts.toSeq: _*)
  }

  /** Rows → ES documents: (index, _id, doc). `_id` from the key column (null
    * key → ES auto-id, as the connector does); the doc is the row minus the
    * routing columns, as JSON. */
  def documents(df: DataFrame, indexPattern: String, timeCol: String,
                idCol: Option[String],
                docCols: Option[Seq[String]] = None): DataFrame = {
    val cols = docCols.getOrElse(
      df.columns.toSeq.filterNot(c => idCol.contains(c) || c == timeCol))
      .map(col)
    // a null event time would null every date segment and (via concat) the
    // whole index name, and one null index NPEs the partition's bulk
    // payload — route such rows to a literal fallback index instead (the
    // connector's behavior for unparseable dates)
    val fallbackIndex = PatternRx.replaceAllIn(indexPattern, "unrouted")
    df.select(
      coalesce(indexName(indexPattern, col(timeCol)), lit(fallbackIndex))
        .as("index"),
      idCol.map(c => col(c).cast("string")).getOrElse(lit(null).cast("string"))
        .as("_id"),
      to_json(struct(cols.toIndexedSeq: _*)).as("doc"))
  }

  /** Minimal JSON string escape for values interpolated into action lines
    * (_id comes from arbitrary message keys). */
  private[ops] def jsonEscape(s: String): String = {
    if (s == null) return "" // defense in depth: never poison a whole batch
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < 0x20 => b.append(f"\\u$c%04x")
      case c => b.append(c)
    }
    b.toString
  }

  /** The _bulk API payload for one micro-batch partition: action line +
    * source line per doc (ndjson). Pure string building — the transport
    * POSTs this per partition inside foreachBatch. */
  def bulkPayload(docs: Iterator[(String, String, String)]): String =
    docs.map { case (index, id, doc) =>
      val idx = jsonEscape(index)
      val action =
        if (id == null) s"""{"index":{"_index":"$idx"}}"""
        else s"""{"index":{"_index":"$idx","_id":"${jsonEscape(id)}"}}"""
      action + "\n" + doc
    }.mkString("", "\n", "\n")
}
