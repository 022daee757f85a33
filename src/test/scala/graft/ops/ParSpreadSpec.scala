package graft.ops

import java.nio.file.Files

import graft.SparkSuite

/** The parallelism guard under every per-row-heavy operator (hashing,
  * vector math): narrow file scans must widen, and the inputs it
  * deliberately leaves alone must already be wide. */
class ParSpreadSpec extends SparkSuite {
  import spark.implicits._

  test("a local in-memory input is already default-parallelism wide (the skip is safe)") {
    // spread() returns non-file-backed inputs unchanged. That is safe for
    // LocalRelation data ONLY because LocalTableScanExec parallelizes its
    // rows across leafNodeDefaultParallelism — asserted here so a Spark
    // upgrade that changes that behavior fails this spec instead of
    // silently serializing MinHash/Similarity over one partition.
    val local = (1 to 10000).map(i => (i.toLong, s"doc $i")).toDF("id", "t")
    assert(local.inputFiles.isEmpty, "probe must be a non-file-backed plan")
    assert(Par.spread(local).rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
  }

  test("a narrow single-file scan is widened; the result carries every row") {
    val dir = new java.io.File(
      Files.createTempDirectory("par-narrow").toFile, "data").getAbsolutePath
    (1 to 5000).map(i => (i.toLong, s"text $i")).toDF("id", "t")
      .coalesce(1).write.parquet(dir)
    val scan = spark.read.parquet(dir)
    assert(scan.rdd.getNumPartitions == 1)
    val out = Par.spread(scan)
    assert(out.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    assert(out.count() == 5000)
  }
}
