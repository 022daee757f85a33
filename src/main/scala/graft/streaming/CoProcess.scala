package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-stream co-processing: a LIVE topic enriched against another LIVE
  * topic (the case [[graft.ops.AsOfJoin]]'s static dimension and the
  * broadcast-join queries cannot cover — both sides are unbounded).
  *
  * Reference semantics: a Pulsar Function subscribed to two topics keys
  * its state by message key and pairs records that arrive within a time
  * tolerance; records whose partner never shows up are NOT silently
  * dropped — the function times them out and routes them onward (the
  * dead-letter/late-data discipline, e.g. redelivery tracking in
  * pulsar-client/.../UnAckedMessageTracker.java applies a timeout to
  * unpaired work). Spark-first mapping: a watermarked stream-stream
  * interval join. State size is bounded by the watermark lag — each side
  * buffers only rows younger than (watermark − tolerance); the join is
  * key-partitioned, so it scales out exactly like a shuffle join, and the
  * outer leg emits once the watermark PROVES no partner can arrive.
  */
object CoProcess {

  /** Enrich `left` with `right` rows of equal key whose event time lies in
    * `[leftTime − tolerance, leftTime]`. Column names must be disjoint
    * across the two frames (rename before calling); `lag` is the
    * out-of-orderness bound on BOTH inputs — it gates when unmatched left
    * rows are released with null enrichment and `disposition = unmatched`.
    */
  def enrich(left: DataFrame, right: DataFrame,
             leftKey: String, rightKey: String,
             leftTime: String, rightTime: String,
             lag: String, tolerance: String): DataFrame = {
    val l = left.withWatermark(leftTime, lag)
    val r = right.withWatermark(rightTime, lag)
    val cond = col(leftKey) === col(rightKey) &&
      col(rightTime) >= col(leftTime) - expr(s"INTERVAL $tolerance") &&
      col(rightTime) <= col(leftTime)
    l.join(r, cond, "leftOuter")
      .withColumn("disposition",
        when(col(rightKey).isNull, lit("unmatched"))
          .otherwise(lit("enriched")))
  }
}
