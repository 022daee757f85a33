package graft.ops

import org.apache.spark.sql.DataFrame

/** Shared parallelism guard: per-row-compute-heavy operators (hashing,
  * vector math) must not inherit a narrow scan partitioning — one small
  * parquet file = one partition = one core doing all the work. The tiny
  * shuffle of input rows is orders cheaper than serializing the compute.
  *
  * The already-wide case matters just as much: collapsing a 100 TB scan's
  * thousands of input splits down to defaultParallelism would shuffle the
  * whole corpus into a few giant partitions. The guard therefore keys on
  * `df.inputFiles` — leaf-file metadata from the logical plan, no physical
  * planning (the old `df.rdd.getNumPartitions` probe planned the query
  * twice and pinned the pre-AQE partitioning) — and only spreads inputs
  * narrower than the session's parallelism.
  */
private[ops] object Par {
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    val nFiles = df.inputFiles.length
    if (nFiles == 0 || nFiles < p) df.repartition(p) else df
  }
}
