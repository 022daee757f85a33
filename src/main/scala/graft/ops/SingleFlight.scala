package graft.ops

/** Single-flight per-key memoization for driver-held trained artifacts
  * (IVF centroids, PQ codebooks, SQ bounds): under a CONCURRENT query
  * board, a plain concurrent-map `getOrElseUpdate` lets every thread
  * that misses the same cold key train its own copy — the r11 contention
  * bench measured the ANN queries duplicating whole k-means runs this
  * way (8–18× inflation at 4–8 threads). Here the map holds a cheap
  * cell under `computeIfAbsent` (no training inside the map lock) and
  * the cell's `lazy val` runs the computation exactly once — same-key
  * racers block on that one training run, different keys never contend.
  *
  * A failed computation propagates to every waiter and stays poisoned
  * for the cell's lifetime — retry semantics belong to the caller, which
  * matches trained-artifact determinism (a deterministic build that
  * failed once will fail again).
  */
final class SingleFlight[K, V] {
  // the lazy val holds a Try, not the raw value: a throwing lazy-val
  // initializer is RETRIED on next access (the bitmap never sets), which
  // would silently re-run a failed training per caller — memoizing the
  // Try makes the failure as single-flight as the success
  private final class Cell(compute: () => V) {
    lazy val value: scala.util.Try[V] = scala.util.Try(compute())
  }
  private val cells = new java.util.concurrent.ConcurrentHashMap[K, Cell]()

  /** The memoized value for `k`, computing it at most once process-wide. */
  def apply(k: K)(compute: => V): V =
    cells.computeIfAbsent(k, _ => new Cell(() => compute)).value.get

  /** Drop one key's cell (tests: simulate a fresh process over the same
    * persisted artifact store). An in-flight computation for the key
    * completes and is discarded; a racer that entered before the drop
    * still gets its value — exactly a new process's cold-memo shape. */
  private[graft] def drop(k: K): Unit = { cells.remove(k); () }
}
