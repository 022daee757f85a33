package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the most recent right row with the
  * same key and right.time <= left.time.
  *
  * This is the enrichment-join the reference expresses as a Function doing a
  * TableView/state lookup per record (reference: client/api/TableView.java:60,
  * BaseContext.getState BaseContext.java:131) — generalized to point-in-time
  * correctness instead of "latest at processing time".
  *
  * Spark-first design (scale path): union both sides, one shuffle on the key,
  * one sort within partitions, then `last(..., ignoreNulls)` over an
  * unbounded-preceding running window. Cost is O((|L|+|R|) log) with a single
  * shuffle — never the |L|x|matching R| blowup of the naive join+argmax, which
  * is what makes it survive 100 TB with hot keys.
  */
object AsOfJoin {

  /** @param leftKeys/rightKeys equi-join key columns (positionally matched)
    * @param leftTime/rightTime event-time columns; right rows with
    *        time <= left time are eligible (inclusive)
    * @param rightTieBreak among right rows at the identical timestamp, the row
    *        with the greatest tie-break value wins (determinism at scale)
    * @param joinType "left" keeps unmatched left rows (right cols null);
    *        "inner" drops them */
  def asOf(left: DataFrame, leftKeys: Seq[String], leftTime: String,
           right: DataFrame, rightKeys: Seq[String], rightTime: String,
           rightTieBreak: Seq[String] = Nil,
           joinType: String = "inner"): DataFrame = {
    require(leftKeys.length == rightKeys.length, "key arity mismatch")
    val keyNames = leftKeys.indices.map(i => s"__k$i")
    val rightPayloadCols = right.columns.toSeq

    val l = left.select(
      leftKeys.indices.map(i => col(leftKeys(i)).as(keyNames(i))) ++ Seq(
        col(leftTime).as("__t"),
        lit(1).as("__is_left"),
        struct(left.columns.map(col).toIndexedSeq: _*).as("__l"),
        lit(null).cast(right.select(struct(right.columns.map(col)
          .toIndexedSeq: _*)).schema.head.dataType).as("__r")): _*)

    val r = right.select(
      rightKeys.indices.map(i => col(rightKeys(i)).as(keyNames(i))) ++ Seq(
        col(rightTime).as("__t"),
        lit(0).as("__is_left"),
        lit(null).cast(left.select(struct(left.columns.map(col)
          .toIndexedSeq: _*)).schema.head.dataType).as("__l"),
        struct(right.columns.map(col).toIndexedSeq: _*).as("__r")): _*)

    // Right rows sort before left rows at the same instant (__is_left asc), so
    // a right row at exactly left.time is matched (inclusive). Tie-break among
    // simultaneous right rows via the caller-chosen columns.
    val tieCols = rightTieBreak.map(c => col("__r").getField(c))
    val w = Window.partitionBy(keyNames.map(col): _*)
      .orderBy((col("__t").asc +: col("__is_left").asc +: tieCols.map(_.asc)): _*)
      .rowsBetween(Window.unboundedPreceding, 0)

    val matched = l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__is_left") === 1)

    val filtered = joinType match {
      case "inner" => matched.where(col("__match").isNotNull)
      case "left"  => matched
      case other   => throw new IllegalArgumentException(s"asOf joinType: $other")
    }
    filtered.select(
      left.columns.map(c => col(s"__l.$c")).toIndexedSeq ++
        rightPayloadCols.map(c => col("__match").getField(c).as(c)): _*)
  }
}
