package graft.ops

import graft.functions.TextFunctions.fingerprint
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter membership prefilter for incremental dedup — the standard
  * accelerator in front of a corpus-sized fingerprint index: a new batch
  * first probes a bits-only summary of the index (kilobytes, broadcast);
  * only fingerprints the filter says "maybe present" pay the exact
  * anti-join against the store. At 100 TB the index has billions of rows
  * and most batch documents are novel, so the prefilter turns the common
  * case into a broadcast lookup with zero shuffle.
  *
  * Reference analog: the broker consults an in-memory sequence-id map
  * before touching the dedup cursor ledger
  * (pulsar-broker/.../persistent/MessageDeduplication.java
  * `isDuplicate` fast path); the bloom bits are the content-hash
  * counterpart with a bounded footprint.
  *
  * '''Determinism contract.''' A partitioned bloom: hash row `r` of key
  * `fp` sets bit `md5(r ‖ ':' ‖ fp)`'s first three hex nibbles
  * (m = 4096 bits per row, k rows). Pure md5-nibble arithmetic, replayed
  * verbatim by the DuckDB oracle, so `bloom_hit` itself is hash-checked —
  * not just the dedup verdict. The classic bloom guarantee rides along as
  * data: `admissible` = (bloom_hit OR NOT present) must be true on every
  * row — no false negatives, ever.
  */
object Bloom {

  private val M = 4096 // bits per hash row = 3 hex nibbles

  /** Bit index 0..4095 for hash row `r` of `key`. */
  private def bitIdx(r: Int, key: Column): Column = {
    val h = md5(concat(lit(s"$r:"), key))
    def nib(i: Int): Column = {
      val a = ascii(substring(h, i, 1))
      when(a <= 57, a - 48).otherwise(a - 87)
    }
    nib(1) * 256 + nib(2) * 16 + nib(3)
  }

  /** The set bits of `keys` (one column) as (r, bit) rows — at most
    * k·4096 rows regardless of index size; this is what gets broadcast. */
  def bits(keys: DataFrame, k: Int): DataFrame = {
    val key = col(keys.columns.head)
    keys.select(explode(array((0 until k).map(r =>
        struct(lit(r).as("r"), bitIdx(r, key).as("bit"))): _*)).as("rb"))
      .select(col("rb.r").as("r"), col("rb.bit").as("bit"))
      .distinct()
  }

  /** `probes` (must carry a `keyCol` column) extended with a `bloom_hit`
    * boolean: true ⇔ every one of the key's k bits is set in `bloomBits`
    * ((r, bit) rows, broadcast). Grouping keys = all probe columns, so the
    * frame keeps its shape. */
  def withHits(probes: DataFrame, keyCol: String, bloomBits: DataFrame,
               k: Int): DataFrame = {
    val keep = probes.columns.map(col)
    probes
      .select(keep :+ explode(array((0 until k).map(r =>
        struct(lit(r).as("r"), bitIdx(r, col(keyCol)).as("bit"))): _*))
        .as("rb"): _*)
      .select(keep :+ col("rb.r").as("r") :+ col("rb.bit").as("bit"): _*)
      .join(broadcast(bloomBits.select(col("r"), col("bit"))
        .withColumn("set", lit(true))), Seq("r", "bit"), "left")
      .groupBy(keep: _*)
      .agg((count(lit(1)) === sum(when(col("set"), 1L).otherwise(0L)))
        .as("bloom_hit"))
  }

  /** Probe `batch` content fingerprints against a bloom built over
    * `index` fingerprints: one row per batch document with the filter's
    * verdict, the exact truth, and the no-false-negative invariant.
    *
    * Columns: (idCol, fp, bloom_hit, present, admissible). Documents with
    * `bloom_hit = false` are PROVEN novel — an ingest pipeline appends
    * them without consulting the store; only hits pay the exact join.
    */
  def prefilterDedup(batch: DataFrame, index: DataFrame, idCol: String,
                     textCol: String, k: Int = 2): DataFrame = {
    val idxFps = index.select(fingerprint(col(textCol)).as("fp")).distinct()
    val bloomBits = bits(idxFps, k)
    val probes = batch.select(col(idCol), fingerprint(col(textCol)).as("fp"))
    // bloom_hit ⇔ every one of the k probed bits is set
    val hits = withHits(probes, "fp", bloomBits, k)
    // ground truth — at scale this join runs ONLY for bloom_hit rows; it is
    // computed for all rows here so the invariant is checkable per row
    val truth = probes
      .join(broadcast(idxFps.withColumn("present", lit(true))),
        Seq("fp"), "left")
      .select(col(idCol), col("fp"),
        coalesce(col("present"), lit(false)).as("present"))
    hits.join(truth, Seq(idCol, "fp"))
      .select(col(idCol), col("fp"), col("bloom_hit"), col("present"),
        (col("bloom_hit") || !col("present")).as("admissible"))
  }
}
