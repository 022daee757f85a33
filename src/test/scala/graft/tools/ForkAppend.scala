package graft.tools

import java.io.File

import graft.ops.{EdgeIndex, ExactDedupIndex}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Child-JVM worker for CrossProcessStoreSpec: a REAL second process (not
  * a thread) appending crawl batches to one shared [[EdgeIndex]] and one
  * shared [[ExactDedupIndex]], so the cross-process claims — staged-
  * then-renamed batch publishes for the edge store, [[graft.ops.StoreLock]]
  * serialization for the probe-then-append store — are exercised against
  * an actual OS process boundary (file locks, committer `_temporary`
  * roots, and renames are all per-process state).
  *
  * Protocol: both stores start COLD — the workers deliberately RACE
  * creation on an empty root (since [[graft.ops.StoreLock]] serializes
  * the cold-start generation allocation across processes, creation no
  * longer needs the old provision-then-fan-out convention). Each worker
  * drops `ready-<id>` and blocks on the parent's `go` flag so the
  * append phases genuinely overlap, then appends its batches
  * alternating between the two stores. Batch content is a pure function
  * of (worker, i) — the spec replays the same batches serially (in
  * global ord order) for the baseline.
  */
object ForkAppend {

  /** Globally-unique, worker-interleaved ord: round i of worker w. The
    * serial baseline applies batches in increasing ord. */
  def ord(worker: Int, i: Int): Long = 1L + i * 2L + (worker - 1)

  /** Edge batch for (worker, i): 30 links over a 50-node id space, built
    * so batches overlap ACROSS workers (the deduped union must collapse
    * cross-process duplicates, not just within-process ones). */
  def edgeBatch(spark: SparkSession, worker: Int, i: Int): DataFrame = {
    import spark.implicits._
    (0 until 30).map { j =>
      ((worker + i * 7 + j * 3) % 50L, (i * 5 + j * 11) % 50L)
    }.toDF("src", "dst")
  }

  /** Doc batch for (worker, i): 20 docs — half unique to the (worker, i)
    * cell, half drawn from a shared pool both workers emit, so keeper
    * election arbitrates cross-process duplicates by (ord, id). */
  def docBatch(spark: SparkSession, worker: Int, i: Int): DataFrame = {
    import spark.implicits._
    (0 until 20).map { j =>
      val id = worker * 100000L + i * 1000L + j
      val text =
        if (j % 2 == 0) s"unique w$worker i$i j$j payload"
        else s"shared pool doc ${(i * 10 + j) % 15}"
      (id, text)
    }.toDF("id", "text")
  }

  private def waitFor(f: File, timeoutMs: Long): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!f.exists()) {
      if (System.currentTimeMillis() > deadline)
        sys.error(s"timed out waiting for ${f.getPath}")
      Thread.sleep(50)
    }
  }

  // args: <root> <workerId> <nBatches>
  def main(args: Array[String]): Unit = {
    val Array(root, workerS, nS) = args
    val worker = workerS.toInt
    val n = nS.toInt
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName(s"fork-append-$worker")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      val edges = new EdgeIndex(spark, s"$root/edges")
      val exact = new ExactDedupIndex(spark, s"$root/exact", "id", "text")
      // barrier: both workers' sessions are warm before any append runs,
      // so the phases overlap instead of one child finishing first
      java.nio.file.Files.write(
        new File(root, s"ready-$worker").toPath, Array.empty[Byte])
      waitFor(new File(root, "go"), 120000)
      for (i <- 0 until n) {
        edges.addEdges(edgeBatch(spark, worker, i), ord(worker, i))
        exact.addAndDedup(docBatch(spark, worker, i), ord(worker, i))
      }
    } catch {
      case e: Throwable => e.printStackTrace(); sys.exit(1)
    } finally spark.stop()
  }
}
