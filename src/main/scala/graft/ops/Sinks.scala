package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Sink-side operators: JDBC upsert, geo-replication fan-out, interceptors.
  */
object Sinks {

  /** Build the ANSI MERGE an upsert sink issues per micro-batch — the JDBC
    * sink's INSERT_MODE=UPSERT (reference: pulsar-io/jdbc/core/.../
    * JdbcSinkConfig.java:118-141; null value → DELETE mode likewise). The
    * batch is staged to a temp table, then merged — the scalable shape (one
    * round-trip, set-based) rather than per-row statements. */
  def mergeSql(target: String, staging: String, keyCols: Seq[String],
               valueCols: Seq[String], deleteOnNull: Option[String] = None): String = {
    val on = keyCols.map(k => s"t.$k = s.$k").mkString(" AND ")
    val set = valueCols.map(c => s"$c = s.$c").mkString(", ")
    val cols = (keyCols ++ valueCols).mkString(", ")
    val vals = (keyCols ++ valueCols).map(c => s"s.$c").mkString(", ")
    val deleteClause = deleteOnNull
      .map(c => s"WHEN MATCHED AND s.$c IS NULL THEN DELETE ").getOrElse("")
    s"MERGE INTO $target t USING $staging s ON $on " +
      deleteClause +
      s"WHEN MATCHED THEN UPDATE SET $set " +
      s"WHEN NOT MATCHED THEN INSERT ($cols) VALUES ($vals)"
  }

  /** foreachBatch upsert runner: dedupes the micro-batch to last-value-per-key
    * (a batch may contain several updates for one key), then hands the batch
    * and its MERGE statement to `exec` (a JDBC connection runner in
    * production; a test harness here). At-least-once overall; exactly-once
    * when the MERGE is idempotent, which last-value-per-key makes it. */
  def upsertBatch(batch: DataFrame, ordCol: String, target: String,
                  staging: String, keyCols: Seq[String])
                 (exec: (DataFrame, String) => Unit): Unit = {
    val valueCols = batch.columns.filterNot(keyCols.contains).toSeq
    val deduped = Compaction.compact(batch, keyCols, col(ordCol))
    exec(deduped, mergeSql(target, staging, keyCols, valueCols))
  }

  /** Geo-replication: replicate the local topic stream to N remote clusters,
    * each with its own checkpoint (its own replicator cursor — reference:
    * broker/.../persistent/PersistentReplicator.java:69-291). Loop guard
    * (reference Message.isReplicated/getReplicatedFrom,
    * Message.java:231-239): only LOCALLY-produced rows
    * (`replicated_from IS NULL`) are forwarded, stamped with this cluster
    * as their origin — a row that arrived via replication is never
    * re-replicated, so an A↔B (or full-mesh) deployment converges instead
    * of ping-ponging; each origin cluster fans its own rows out directly.
    * Returns the running queries; each progresses independently. */
  def replicate(df: DataFrame, localCluster: String,
                sinks: Seq[(String, String)], // (path, checkpoint)
                trigger: Trigger = Trigger.AvailableNow()): Seq[StreamingQuery] = {
    val local = df.where(col("replicated_from").isNull)
      .withColumn("replicated_from", lit(localCluster))
    sinks.map { case (path, cp) =>
      local.writeStream.format("graft-topic")
        .option("path", path).option("checkpointLocation", cp)
        .trigger(trigger).start()
    }
  }

  /** Bucketed write: pre-shuffle a fact table by its join key into N buckets
    * so repeated joins/aggregations on that key run with NO exchange — the
    * managed-table analog of the reference's key-hash partitioned topics
    * (key ordering + locality per hash range). At 100 TB this turns the
    * recurring fact-fact join from a full shuffle into a local zip of
    * buckets. Requires a catalog table (bucketing lives in the metastore). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keyCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Producer/consumer interceptors (reference: ProducerInterceptor /
    * ConsumerInterceptor): pure row transforms applied at the sink/source
    * boundary, composed in registration order via [[Interceptors.chain]].
    * Declarative columns keep them codegen'd. */
  def withProducerInterceptor(df: DataFrame, f: DataFrame => DataFrame): DataFrame = f(df)
  def withConsumerInterceptor(df: DataFrame, f: DataFrame => DataFrame): DataFrame = f(df)
}

/** Interceptor combinators — the reference's interceptor chain semantics
  * (ProducerInterceptor.beforeSend transforms the message before publish,
  * interceptors run in registration order, ConsumerInterceptor.beforeConsume
  * mirrors it on the receive path; reference:
  * client/api/ProducerInterceptor.java, ConsumerInterceptor.java and the
  * chain impls pulsar-client/.../ProducerInterceptors.java,
  * ConsumerInterceptors.java). Each interceptor is a declarative
  * DataFrame→DataFrame transform, so a chain stays one codegen'd projection. */
object Interceptors {
  type Interceptor = DataFrame => DataFrame

  /** Compose in registration order: the first interceptor sees the original
    * record, each next one the previous output — beforeSend chaining. */
  def chain(interceptors: Seq[Interceptor]): Interceptor =
    df => interceptors.foldLeft(df)((d, f) => f(d))

  /** Metadata mutation: stamp/overwrite a property (message properties are
    * the reference's mutable metadata surface for interceptors). */
  def addProperty(key: String, value: Column): Interceptor =
    df => df.withColumn("properties",
      map_concat(
        map_filter(coalesce(col("properties"),
          map().cast("map<string,string>")), (k, _) => k =!= key),
        map(lit(key), value.cast("string"))))

  /** Payload transform (beforeSend rewriting the value). */
  def mapValue(f: Column => Column): Interceptor =
    df => df.withColumn("value", f(col("value")))

  /** Filtering interceptor: silently drop records matching `pred` (the
    * interceptor-returns-null drop convention). Rows where the predicate
    * evaluates to NULL (e.g. a tombstone's null value) are KEPT — under SQL
    * three-valued logic a bare `!pred` would silently drop them. */
  def dropWhere(pred: Column): Interceptor =
    df => df.where(!coalesce(pred, lit(false)))
}
