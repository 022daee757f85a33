package graft.ops

import org.apache.spark.sql.DataFrame

/** Shared parallelism guard: per-row-compute-heavy operators (hashing,
  * vector math) must not inherit a narrow scan partitioning — one small
  * parquet file = one partition = one core doing all the work. The tiny
  * shuffle of input rows is orders cheaper than serializing the compute.
  *
  * The already-wide case matters just as much: collapsing a 100 TB scan's
  * thousands of input splits down to defaultParallelism would shuffle the
  * whole corpus into a few giant partitions. The guard therefore:
  *
  *  - leaves NON-file-backed inputs alone (memory streams, post-shuffle
  *    plans): their width is unknowable without planning the query twice
  *    (the old `df.rdd.getNumPartitions` probe did exactly that and pinned
  *    the pre-AQE partitioning), and forcing a repartition would collapse a
  *    plan that is already wide. LocalRelation inputs are safe to skip for
  *    a different reason: LocalTableScanExec parallelizes its rows across
  *    leafNodeDefaultParallelism on its own (asserted in ParSpreadSpec, so
  *    a Spark behavior change surfaces as a test failure, not a silent
  *    1-partition hash loop);
  *  - for file-backed inputs, estimates the scan's partition count the way
  *    `FilePartition` bin-packs splits (openCost padding, maxPartitionBytes
  *    / bytesPerCore split sizing). A raw file COUNT is not enough: many
  *    tiny files pack into far fewer partitions than files. The estimate
  *    `ceil(paddedBytes / maxSplitBytes)` is a LOWER bound on the real
  *    packing (each packed partition holds at most maxSplitBytes), so
  *    "estimate ≥ parallelism" safely implies the scan is wide enough.
  *
  * File sizes come from driver-side stats of the (already-listed) leaf
  * files; on a filesystem we cannot stat, the file-count heuristic is the
  * fallback.
  */
private[graft] object Par {
  private def fileSize(path: String): Long =
    try {
      val p =
        if (path.startsWith("file:"))
          java.nio.file.Paths.get(new java.net.URI(path))
        else java.nio.file.Paths.get(path)
      java.nio.file.Files.size(p)
    } catch { case _: Exception => -1L }

  /** Keyed repartition with an EXPLICIT partition count for the
    * partition-column shuffle in front of a `partitionBy` write (or a
    * compute-heavy keyed stage). Keyed on the same columns it still lands
    * one file per touched directory — every key hashes to exactly one
    * task — but the explicit N (the session's shuffle-partition conf, so
    * it scales with the deployment) exempts the exchange from AQE
    * partition coalescing: REPARTITION_BY_COL is coalescible, and on the
    * small-bytes store appends AQE folded the write to ONE task writing
    * every partition directory sequentially (measured 1.1-1.3 s
    * single-task appends; the compacts pay the same shape). */
  def byCols(df: DataFrame,
             cols: org.apache.spark.sql.Column*): DataFrame =
    df.repartition(
      df.sparkSession.sessionState.conf.numShufflePartitions, cols: _*)

  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    val files = df.inputFiles
    if (files.isEmpty) return df // unknown width — never force a collapse
    def bytesConf(key: String, default: String): Long =
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        spark.conf.get(key, default))
    val maxPartitionBytes = bytesConf("spark.sql.files.maxPartitionBytes", "128MB")
    val openCost = bytesConf("spark.sql.files.openCostInBytes", "4MB")
    // once padded bytes reach p × maxPartitionBytes the scan is provably
    // wide (bytesPerCore ≥ maxPartitionBytes ⇒ maxSplit = maxPartitionBytes
    // ⇒ estimate ≥ p), so statting stops there — and at the first
    // unstatable file (remote FS), falling back to the count heuristic
    // without touching the rest
    var totalBytes = 0L
    var i = 0
    while (i < files.length) {
      val s = fileSize(files(i))
      if (s < 0L)
        return if (files.length < p) df.repartition(p) else df
      totalBytes += s + openCost
      if (totalBytes >= p.toLong * maxPartitionBytes) return df
      i += 1
    }
    val bytesPerCore = totalBytes / math.max(p, 1)
    val maxSplit = math.min(maxPartitionBytes, math.max(openCost, bytesPerCore))
    val estimated = (totalBytes + maxSplit - 1) / math.max(maxSplit, 1)
    if (estimated < p) df.repartition(p) else df
  }
}
