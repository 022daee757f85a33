package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Process-level cache of DERIVED CORPUS ARTIFACTS, materialized to parquet
  * — the data-sized siblings of the driver-sized caches the query modules
  * already keep (IVF centroids, PQ codebooks, BPE merges): an LSH pair set
  * or a resolved cluster map is computed once per corpus snapshot in a real
  * deployment and persisted next to the table; every downstream decision
  * (keeper election, corpus pruning, link seeding) reads the artifact.
  * Parquet, not `.persist()`: the artifact must not pin executor memory,
  * and reading it back costs one pruned columnar scan — the same shape it
  * would have at 100 TB. */
object Artifacts {
  private val paths =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  /** The artifact `kind` for corpus `d`: built + written once per process,
    * then re-read per consumer. `build` must be deterministic for the
    * (d, kind) key — same contract as the trained-model caches. */
  def materialized(s: SparkSession, d: String, kind: String)
                  (build: => DataFrame): DataFrame = {
    val p = paths.computeIfAbsent((d, kind), _ => {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-$kind").toFile.getAbsolutePath
      build.write.mode("overwrite").parquet(dir)
      dir
    })
    s.read.parquet(p)
  }
}
