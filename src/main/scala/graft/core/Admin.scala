package graft.core

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Admin query surface over a graft-topic directory — the point-lookup and
  * inspection APIs of the reference's admin client
  * (reference: pulsar-client-admin-api/.../Topics.java — peekMessages :1656,
  * getMessageById :1683, getMessageIdByTimestamp :1707, skipMessages :1537,
  * analyzeSubscriptionBacklog :2133).
  *
  * Every call is a pruned scan: offset/publish_time predicates reach
  * [[graft.sources.v2.SegmentStats]] so lookups touch only the candidate
  * segments.
  */
class Admin(spark: SparkSession, topicDir: String) {

  private def topic: DataFrame =
    spark.read.format("graft-topic").option("path", topicDir).load()

  /** First n messages from a cursor position, in offset order (peek does not
    * consume — it is just a bounded read). */
  def peekMessages(fromOffset: Long, n: Int): Array[Row] =
    topic.where(col("offset") >= fromOffset)
      .orderBy(col("offset")).limit(n).collect()

  /** Point lookup by message position. */
  def getMessageById(offset: Long): Option[Row] =
    topic.where(col("offset") === offset).collect().headOption

  /** Position of the first message published at/after the timestamp. */
  def getMessageIdByTimestamp(tsMs: Long): Option[Long] = {
    val r = topic.where(col("publish_time") >=
        lit(new java.sql.Timestamp(tsMs)))
      .agg(min(col("offset"))).collect().head
    if (r.isNullAt(0)) None else Some(r.getLong(0))
  }

  /** Entries/bytes between a cursor position and the head — the
    * analyzeSubscriptionBacklog shape. */
  def analyzeBacklog(cursorOffset: Long): (Long, Long) = {
    val r = topic.where(col("offset") > cursorOffset)
      .agg(count(lit(1)), sum(octet_length(col("value")))).collect().head
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** The cursor position after skipping n messages — skipMessages as a pure
    * computation (the caller owns cursor state). */
  def skipMessages(fromOffset: Long, n: Int): Option[Long] =
    peekMessages(fromOffset, n).lastOption
      .map(_.getAs[Long]("offset") + 1)
}

/** Materialized TableView handle over a (compacted or raw) topic — the
  * read surface of TableView (reference: client/api/TableView.java:35-112:
  * get/containsKey/size/entrySet on the continuously-updated map; the impl
  * materializes read-all-existing then tails, TableViewImpl.java:96-99).
  *
  * The compaction aggregate runs ONCE per snapshot and is persisted; every
  * get/containsKey/size is a lookup against the cached snapshot, not a topic
  * rescan. `refresh()` re-materializes after new writes — the explicit analog
  * of the listener's continuous upserts (the continuously-updated form is
  * [[graft.streaming.StatefulOps.tableViewStream]]). At 100 TB the snapshot
  * is |keys| rows, cached across the cluster; point gets stay distributed
  * filters on the cache, never a driver-side map of the whole keyspace. */
class TableViewHandle(spark: SparkSession, topicDir: String) {
  import graft.ops.Compaction

  private var cached: Option[DataFrame] = None

  private def snapshot: DataFrame = synchronized {
    cached.getOrElse {
      val s = Compaction.tableView(
        spark.read.format("graft-topic").option("path", topicDir).load(),
        "key", "value", col("offset")).persist()
      s.count() // materialize eagerly so first get() is already warm
      cached = Some(s)
      s
    }
  }

  /** Drop the materialized snapshot; the next read re-compacts the topic. */
  def refresh(): Unit = synchronized {
    cached.foreach(_.unpersist())
    cached = None
  }

  def close(): Unit = refresh()

  def get(key: String): Option[String] =
    snapshot.where(col("key") === key).collect().headOption
      .map(_.getAs[String]("value"))

  def containsKey(key: String): Boolean = get(key).isDefined
  def size(): Long = snapshot.count()

  /** Map-parity full materialization, CAPPED: at 100 TB a topic's keyspace
    * can dwarf driver memory, so this refuses beyond `maxEntries` rather
    * than OOM the driver — stream with [[entries]] instead. */
  def entrySet(maxEntries: Long = 1000000L): Map[String, String] = {
    val n = size()
    require(n <= maxEntries,
      s"TableView holds $n keys > cap $maxEntries; iterate with entries() " +
        "or raise maxEntries explicitly")
    snapshot.collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  /** Driver-memory-safe iteration over the snapshot: partitions are pulled
    * one at a time (toLocalIterator), never the whole keyspace at once. */
  def entries(): Iterator[(String, String)] = {
    import scala.jdk.CollectionConverters._
    snapshot.toLocalIterator().asScala
      .map(r => r.getString(0) -> r.getString(1))
  }
}
