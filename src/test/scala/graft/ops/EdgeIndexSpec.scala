package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.DataFrame

/** [[EdgeIndex]] — the appendable link-edge store: appending crawl
  * batches must land exactly on the full-rebuild edge set, replays must
  * be no-ops, and compaction must preserve the graph. */
class EdgeIndexSpec extends SparkSuite {
  import spark.implicits._

  private def freshDir() = java.nio.file.Files
    .createTempDirectory("graft-edge-idx").toFile.getAbsolutePath

  private def b1 = Seq((1L, 2L), (2L, 3L), (1L, 2L)).toDF("src", "dst")
  private def b2 = Seq((2L, 3L), (3L, 4L), (5L, 1L)).toDF("src", "dst")

  private def edgeSet(df: DataFrame) =
    df.as[(Long, Long)].collect().toSet

  test("append twice equals the full rebuild") {
    val idx = new EdgeIndex(spark, freshDir())
    idx.addEdges(b1, ord = 0)
    idx.addEdges(b2, ord = 1)
    val rebuild = edgeSet(b1.unionAll(b2).distinct())
    assert(edgeSet(idx.edges()) == rebuild,
      "the appended union must equal a one-shot distinct rebuild")
    // the overlap edge (2,3) appears once despite landing in both batches
    assert(idx.edges().count() == rebuild.size)
  }

  test("crash-replayed append is a no-op on the edge set") {
    val idx = new EdgeIndex(spark, freshDir())
    idx.addEdges(b1, ord = 0)
    val before = edgeSet(idx.edges())
    idx.addEdges(b1, ord = 0) // replay after a crash
    assert(edgeSet(idx.edges()) == before)
  }

  test("concurrent appenders converge on the union edge set") {
    // the service shape: crawl workers land batches on the SAME store
    // concurrently. Appends write distinct task files into the live
    // generation, so racers never clobber; the union read collapses
    // whatever interleaving the race produced.
    val dir = freshDir()
    val idx = new EdgeIndex(spark, dir)
    val batches = (0 until 8).map(i =>
      (i, Seq((i.toLong, i + 1L), (i + 1L, i + 2L), (0L, 99L))
        .toDF("src", "dst")))
    Fs.inParallel(batches, maxThreads = 8) { case (i, df) =>
      idx.addEdges(df, ord = i.toLong)
    }
    val want = batches.map(_._2).reduce(_ unionAll _).distinct()
    assert(edgeSet(idx.edges()) == edgeSet(want))
    idx.compact()
    assert(edgeSet(new EdgeIndex(spark, dir).edges()) == edgeSet(want))
  }

  test("compact preserves the graph and collapses duplicate rows") {
    val dir = freshDir()
    val idx = new EdgeIndex(spark, dir)
    idx.addEdges(b1, ord = 0)
    idx.addEdges(b1, ord = 0) // duplicates in the live generation
    idx.addEdges(b2, ord = 1)
    val before = edgeSet(idx.edges())
    idx.compact()
    assert(edgeSet(idx.edges()) == before, "compaction changed the graph")
    // post-compact the live generation holds exactly one row per edge
    assert(idx.rawRows().count() == before.size)
    // reopen from a fresh handle — the store is the disk, not the object
    assert(edgeSet(new EdgeIndex(spark, dir).edges()) == before)
  }

  /** Run `body` with a one-shot action injected at the named Fs.step
    * boundary (the injected action's own step crossings are ignored). */
  private def withInjection(at: String)(action: => Unit)(body: => Unit): Unit = {
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    Fs.stepTrap = label =>
      if (label == at && fired.compareAndSet(false, true)) {
        val saved = Fs.stepTrap
        Fs.stepTrap = null // the injected action crosses steps too
        try action finally Fs.stepTrap = saved
      }
    try body finally Fs.stepTrap = null
  }

  // ---- append-vs-compact: the one writer pair not serialized by a lock.
  // Both interleavings are driven DETERMINISTICALLY through the Fs.step
  // hook instead of hoping a thread race lands in the window.

  test("compact swapping mid-append: the appender re-publishes its batch") {
    // compact runs while the batch is staged (so its listing excludes the
    // batch) and swaps the pointer BEFORE the publish — the exact
    // ordering that used to strand the batch in the replaced generation
    val dir = freshDir()
    val idx = new EdgeIndex(spark, dir)
    idx.addEdges(b1, ord = 0)
    withInjection(at = "edge.batch-staged")(idx.compact()) {
      idx.addEdges(b2, ord = 1)
    }
    val want = edgeSet(b1.unionAll(b2).distinct())
    assert(edgeSet(idx.edges()) == want,
      "batch published into a replaced generation was lost")
    // and it survives the NEXT maintenance cycle (the reap that would
    // have deleted a stranded copy)
    idx.compact()
    assert(edgeSet(new EdgeIndex(spark, dir).edges()) == want)
  }

  test("append landing mid-compact: the carry-over publishes the late batch") {
    // the appender publishes after compact's listing but before its swap
    // completes its read of the world — compact's post-swap carry-over
    // must move the late batch into the new generation
    val dir = freshDir()
    val idx = new EdgeIndex(spark, dir)
    idx.addEdges(b1, ord = 0)
    withInjection(at = "gen.alloc")(idx.addEdges(b2, ord = 1)) {
      idx.compact()
    }
    val want = edgeSet(b1.unionAll(b2).distinct())
    assert(edgeSet(idx.edges()) == want,
      "batch appended during compaction was lost")
    idx.compact()
    assert(edgeSet(new EdgeIndex(spark, dir).edges()) == want)
  }
}
