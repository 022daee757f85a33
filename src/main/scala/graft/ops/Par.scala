package graft.ops

import org.apache.spark.sql.DataFrame

/** Shared parallelism guard: per-row-compute-heavy operators (hashing,
  * vector math) must not inherit a narrow scan partitioning — one small
  * parquet file = one partition = one core doing all the work. The tiny
  * shuffle of input rows is orders cheaper than serializing the compute.
  *
  * Unconditional: probing `df.rdd.getNumPartitions` to decide would force a
  * full physical plan of the unoptimized frame (planning the query twice at
  * scale) and pin the pre-AQE partitioning. The operators calling this are
  * exactly those whose input rows are narrow relative to their per-row
  * compute, so the round-robin exchange is accepted by design.
  */
private[ops] object Par {
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
