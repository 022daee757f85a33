package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Change-data-capture streams in the Debezium envelope — the shape every
  * pulsar-io CDC connector produces (reference: pulsar-io/debezium/{mysql,
  * postgres,mongodb,mssql,oracle}, pulsar-io/canal; the envelope is
  * Debezium's {before, after, op, ts_ms, source}).
  *
  * Operators, Spark-first:
  *  - [[materialize]]: changelog → current table state, one hash aggregation
  *    (latest change per key wins, deletes drop the row) — the same
  *    max_by shape as topic compaction, so it scales identically;
  *  - [[asUpserts]]: changelog → (key, row-or-null) upsert stream for the
  *    JDBC sink's UPSERT / null→DELETE modes (JdbcSinkConfig.java:118-141);
  *  - [[envelope]]: build the CDC envelope from plain rows (the test fixture
  *    generator standing in for a live Debezium feed).
  */
object Cdc {

  /** Debezium op codes: c=create, u=update, d=delete, r=snapshot read. */
  val Creates = "c"; val Updates = "u"; val Deletes = "d"; val Reads = "r"

  def envelopeSchema(row: StructType): StructType = StructType(Seq(
    StructField("before", row, nullable = true),
    StructField("after", row, nullable = true),
    StructField("op", StringType, nullable = false),
    StructField("ts_ms", LongType, nullable = false),
    StructField("source", MapType(StringType, StringType), nullable = true)))

  /** Wrap plain rows as CDC events (fixture generator). `before`/`after`
    * follow Debezium: create/read have no before; delete has no after. */
  def envelope(rows: DataFrame, op: String, tsMs: Column,
               source: Map[String, String] = Map.empty): DataFrame = {
    val rowType = rows.schema
    val row = struct(rows.columns.map(col).toIndexedSeq: _*)
    val (before, after) = op match {
      case Deletes => (row, lit(null).cast(rowType))
      case Creates | Reads => (lit(null).cast(rowType), row)
      case _ => (row, row) // update: both sides (before = previous image upstream)
    }
    rows.select(
      before.as("before"), after.as("after"), lit(op).as("op"),
      tsMs.as("ts_ms"),
      typedlit(source).cast(MapType(StringType, StringType)).as("source"))
  }

  /** Per-row-op variant: `opCol` decides each row's op (a real changelog
    * mixes creates/updates/deletes in one stream). */
  def envelopeMixed(rows: DataFrame, opCol: Column, tsMs: Column): DataFrame = {
    val rowType = rows.schema
    val row = struct(rows.columns.map(col).toIndexedSeq: _*)
    rows.select(
      when(opCol === Creates || opCol === Reads, lit(null).cast(rowType))
        .otherwise(row).as("before"),
      when(opCol === Deletes, lit(null).cast(rowType)).otherwise(row).as("after"),
      opCol.as("op"), tsMs.as("ts_ms"),
      lit(null).cast(MapType(StringType, StringType)).as("source"))
  }

  /** Deterministic last-resort ordering for changes that tie on
    * (ts_ms, delete-flag): a content hash of (op, after). Two same-ts
    * updates with identical content are interchangeable; with different
    * content this picks an arbitrary but RUN-STABLE winner, so
    * materialize/history never flip between runs or partitionings.
    * Callers with a real changelog position (Debezium source offset,
    * topic sequence-id) should pass it as `seqCol` instead. */
  private def contentTiebreak: Column =
    xxhash64(col("op"), to_json(col("after")))

  /** Latest change per key (by ts_ms, then op as the in-tie ordering:
    * deletes after upserts at the same ts, Debezium's emission order). */
  private def latest(changes: DataFrame, keyCols: Seq[String],
                     seqCol: Option[Column] = None): DataFrame = {
    val keyExprs = keyCols.map(k =>
      coalesce(col(s"after.$k"), col(s"before.$k")).as(s"__k_$k"))
    changes
      .select(keyExprs ++ Seq(struct(col("ts_ms"), col("op"), col("after")).as("__c"),
        seqCol.getOrElse(contentTiebreak).as("__seq")): _*)
      .groupBy(keyCols.map(k => col(s"__k_$k")): _*)
      .agg(max_by(col("__c"), struct(col("__c.ts_ms"),
        // d orders after c/r/u at equal ts: 'd' > 'c','r','u' is false for
        // 'u'... use an explicit rank so the tombstone wins ties
        when(col("__c.op") === Deletes, 1).otherwise(0),
        col("__seq"))).as("__last"))
  }

  /** Apply a changelog to produce the CURRENT table: the newest surviving
    * `after` image per key; keys whose newest change is a delete vanish. */
  def materialize(changes: DataFrame, keyCols: Seq[String]): DataFrame =
    latest(changes, keyCols)
      .where(col("__last.op") =!= Deletes)
      .select(col("__last.after.*"))

  /** Changelog → upsert stream: one row per key, `__deleted` true when the
    * key's final state is a delete (feed the JDBC MERGE's null→DELETE). */
  def asUpserts(changes: DataFrame, keyCols: Seq[String]): DataFrame =
    latest(changes, keyCols)
      .select(keyCols.map(k => col(s"__k_$k").as(k)) ++ Seq(
        col("__last.after").as("after"),
        (col("__last.op") === Deletes).as("__deleted")): _*)

  /** Changelog → SCD Type-2 HISTORY table: every change version per key
    * with `valid_from` = its changelog position, `valid_to` = the next
    * change's position (null while open), `is_current` for the one open
    * non-deleted version. Deletes appear as tombstone rows that close
    * validity and can never be current — so `materialize` ≡ the
    * `is_current` slice of `history` (spec'd). One `lead` window
    * partitioned by key: per-key state never crosses keys, the shuffle
    * key is the natural dimension key.
    *
    * Ordering within a key is (ts_ms, delete-after-update, seq): `seqCol`
    * is the changelog position when the feed carries one (Debezium source
    * offset); absent that, a content hash breaks same-ts update ties
    * deterministically so valid_to/is_current never flip across runs. */
  def history(changes: DataFrame, keyCols: Seq[String],
              seqCol: Option[Column] = None): DataFrame = {
    val keyExprs = keyCols.map(k =>
      coalesce(col(s"after.$k"), col(s"before.$k")).as(k))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("valid_from"),
        when(col("op") === Deletes, 1).otherwise(0), col("__seq"))
    changes
      .select(keyExprs ++ Seq(col("op"), col("after"),
        col("ts_ms").as("valid_from"),
        seqCol.getOrElse(contentTiebreak).as("__seq")): _*)
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current",
        col("valid_to").isNull && col("op") =!= Deletes)
      .drop("__seq")
  }
}
