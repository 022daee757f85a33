package graft.ops

import org.apache.spark.sql.DataFrame

/** Shared parallelism guard: per-row-compute-heavy operators (hashing,
  * vector math) must not inherit a narrow scan partitioning — one small
  * parquet file = one partition = one core doing all the work. The tiny
  * shuffle of input rows is orders cheaper than serializing the compute. */
private[ops] object Par {
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
