package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Topic compaction = last-value-per-key, and TableView = its continuously
  * maintained form.
  *
  * Reference semantics: TwoPhaseCompactor scans the topic building a
  * `latestForKey` map, then rewrites keeping only the latest entry per key and
  * dropping keys whose latest entry is a null-value tombstone
  * (reference: pulsar-broker/.../compaction/TwoPhaseCompactor.java:62-152).
  * StrategicTwoPhaseCompactor generalizes "latest" to a pluggable ordering
  * (TopicCompactionStrategy.shouldKeepLeft,
  * reference: pulsar-common/.../topics/TopicCompactionStrategy.java:52-70).
  *
  * Spark-first design: a single hash aggregation `max_by(struct(*), ord)` —
  * map-side partial aggregation means each executor keeps one row per key
  * before the shuffle, so at 100 TB the shuffle carries |keys| rows, not |log|.
  * No sort, no window, no two phases needed.
  */
object Compaction {

  /** Keep the record with the highest `ord` per key. Generalized ordering =
    * pass any orderable Column (struct allowed) — the StrategicTwoPhaseCompactor
    * analog. */
  def compact(df: DataFrame, keyCols: Seq[String], ord: Column): DataFrame = {
    val keep = max_by(struct(df.columns.map(col).toIndexedSeq: _*), ord).as("__kept")
    df.groupBy(keyCols.map(col): _*)
      .agg(keep)
      .select(df.columns.map(c => col(s"__kept.$c")).toIndexedSeq: _*)
  }

  /** Full compaction contract: last-value-per-key by `ord`, then drop keys
    * whose surviving record is a tombstone (`valueCol` null) —
    * TwoPhaseCompactor phase-two behavior. */
  def compactWithTombstones(df: DataFrame, keyCols: Seq[String], ord: Column,
                            valueCol: String): DataFrame =
    compact(df, keyCols, ord).where(col(valueCol).isNotNull)

  /** TableView.get-parity materialization: key → latest value map as a
    * DataFrame (reference: client/api/TableView.java:35-112; read-existing
    * then tail-upsert in TableViewImpl.java:96-99,182). Batch form; the
    * streaming form is [[graft.streaming.TableViewStream]]. */
  def tableView(df: DataFrame, keyCol: String, valueCol: String, ord: Column): DataFrame =
    compactWithTombstones(df, Seq(keyCol), ord, valueCol)
      .select(col(keyCol), col(valueCol))
}
