package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — at 100 TB a handful of keys (one chatty
  * producer, one viral document) can dominate a shuffle partition. AQE's
  * skew-join handles joins; for aggregations these helpers implement the
  * classic two-phase salted aggregate, and for joins the salt-replicate
  * pattern when AQE is unavailable.
  */
object Skew {

  /** Two-phase salted aggregation: phase 1 aggregates (key, salt) spreading a
    * hot key over `saltBuckets` reducers; phase 2 merges per key. Use for
    * algebraic aggregates (sum/count/min/max — pass the merge expression). */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     saltBuckets: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)))
    val phase1 = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    phase1.groupBy(keyCols.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("count"))
  }

  /** Salted broadcast-free join for a skewed left key: replicate each right
    * row `saltBuckets` times, salt left rows randomly-but-deterministically,
    * join on (key, salt). Trades |R|×buckets replication for even partitions. */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
                 rightKey: String, saltBuckets: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1)).cast("array<bigint>")))
    saltedLeft.join(replicatedRight,
      saltedLeft(leftKey) === replicatedRight(rightKey) &&
        saltedLeft("__salt") === replicatedRight("__salt"))
      .drop("__salt")
  }
}
