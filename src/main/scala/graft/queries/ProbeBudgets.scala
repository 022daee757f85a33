package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Persisted tuned probe budgets — the chosen `nprobe` (and the
  * recall/agreement it cleared) for an IVF layout, stored as a corpus
  * artifact BESIDE the quantizer it prices rather than re-profiled per
  * process.
  *
  * The budget is the same kind of trained artifact as the centroids:
  * deterministic in (corpus snapshot, family metric, cell count), chosen
  * by a tuning loop whose cost is one corpus scan per candidate budget.
  * Before round 17 it lived only in a per-JVM [[graft.ops.SingleFlight]]
  * memo, so every new session re-paid the whole profile (the soak run's
  * 190 s first iteration vs 154 s steady state, BENCH_SOAK_R16.json).
  * Here the memo stays on top — a concurrent board's same-key cold
  * misses still share one tuning run — but the chosen budget persists
  * through [[Artifacts.materialized]] (fingerprint-keyed, so a
  * regenerated corpus re-tunes) and a new process reads one tiny
  * parquet instead of profiling.
  *
  * The persisted-store twin of this contract lives in
  * [[graft.ops.IvfIndex]]/[[graft.ops.IvfPqIndex]]: their generations
  * carry `_probe_budget` beside `_quantizer`, invalidated when a
  * retraining compact changes the layout the budget was priced for.
  *
  * Reference analog: negotiated client knobs persisted with the
  * subscription rather than re-derived per connect (cursor properties,
  * `managed-ledger/.../ManagedCursorImpl.java` recover-from-ledger).
  */
object ProbeBudgets {

  private val memo =
    new graft.ops.SingleFlight[(String, String, Int), (Int, Double)]

  /** The tuned budget for (`corpus dir`, `kind`, `cells`): the in-process
    * memo, then the persisted artifact, then — only on a cold store —
    * `compute` (which returns the chosen nprobe plus the metric value it
    * cleared; both persist, so the budget is auditable store state). */
  def tuned(s: SparkSession, d: String, kind: String, cells: Int)(
      compute: => (Int, Double)): Int =
    tunedWithMetric(s, d, kind, cells)(compute)._1

  /** [[tuned]] plus the metric the chosen budget cleared when tuned —
    * for callers whose claim row REPORTS the cleared recall (the
    * q_rag_retrieve_ivf pattern: the audit ran at tune time against the
    * exact twin and persisted; re-running the brute-force audit per
    * query would put the exhaustive read back on the scale curve the
    * indexed twin exists to beat). */
  def tunedWithMetric(s: SparkSession, d: String, kind: String, cells: Int)(
      compute: => (Int, Double)): (Int, Double) =
    memo((d, kind, cells)) {
      import s.implicits._
      val row = Artifacts.materialized(s, d, s"nprobe-$kind-c$cells") {
        val (np, metric) = compute
        Seq((np, metric)).toDF("nprobe", "metric").coalesce(1)
      }.select(col("nprobe").cast("int"), col("metric")).head()
      (row.getInt(0), row.getDouble(1))
    }

  /** Tests: simulate a fresh process's cold memo over the same artifact
    * store (proves the budget is READ back, not silently re-tuned). */
  private[graft] def dropMemo(d: String, kind: String, cells: Int): Unit =
    memo.drop((d, kind, cells))
}
