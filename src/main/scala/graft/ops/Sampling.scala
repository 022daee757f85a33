package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation — the selection step a
  * corpus pipeline runs after dedup and quality scoring (choose a fraction,
  * balance strata, fit a token budget).
  *
  * Everything keys on `md5(key)` rather than an RNG:
  *
  *  - **reproducible**: the same corpus always selects the same rows, on any
  *    cluster size, with no seed plumbing or partition-order sensitivity —
  *    `sample()`'s per-partition RNG changes output when partitioning
  *    changes, which poisons exactly-once pipelines that replay a batch;
  *  - **stable under growth**: a row's keep/drop never flips because other
  *    rows arrived (Bernoulli by hash), so incremental runs agree with
  *    one-shot runs row-by-row;
  *  - **oracle-checkable**: DuckDB computes the identical md5 hex string, so
  *    the driver hash-gate verifies these operators exactly, not
  *    statistically.
  *
  * Scale shape: `hashFraction` is a pure filter (no shuffle, fully pushed
  * into the scan stage); the stratified variants are one hash-partitioned
  * window per call — the same shuffle a groupBy would pay, with no driver
  * state and no collect.
  */
object Sampling {

  /** Lowercase-hex md5 of the key — the shared sort/threshold domain.
    * Uniform in [0, 16^32) for distinct keys; fixed-width, so string order
    * equals numeric order and Spark and DuckDB compare identically. */
  private def hashOf(key: Column): Column = md5(key.cast("string"))

  /** 32-hex-char threshold such that P[md5 < threshold] = frac. */
  private[graft] def fracThreshold(frac: Double): String = {
    require(frac >= 0.0 && frac <= 1.0, s"fraction $frac outside [0,1]")
    val full = BigInt(1) << 128
    val cut = (BigDecimal(full) * frac).toBigInt.min(full)
    if (cut >= full) "g" // > any hex digit: keep everything
    else {
      val s = cut.toString(16)
      ("0" * (32 - s.length)) + s
    }
  }

  /** Deterministic Bernoulli sample: keep rows with md5(key) below the
    * fraction threshold. A pure filter — survives any repartitioning and
    * pushes to the scan. */
  def hashFraction(df: DataFrame, key: Column, frac: Double): DataFrame =
    df.where(hashOf(key) < lit(fracThreshold(frac)))

  /** Per-stratum top-k in hash order (a deterministic k-reservoir per
    * stratum): balances strata regardless of their raw sizes — the
    * language/source-balancing step of corpus assembly. Ties in the hash
    * are broken by the key itself, so selection is total-ordered. */
  def stratifiedTopK(df: DataFrame, strata: Seq[String], key: Column,
                     k: Int): DataFrame = {
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(hashOf(key), key)
    df.withColumn("__rank", row_number().over(w))
      .where(col("__rank") <= k).drop("__rank")
  }

  /** [[stratifiedTopK]] with the dominant-stratum skew removed: top-k is
    * MERGEABLE, so phase one takes a local top-k inside each of `salts`
    * deterministic sub-streams of a stratum (parallelism × salts), and
    * phase two re-ranks only the ≤ salts·k survivors. The result is
    * IDENTICAL row-for-row to the unsalted selection — each salt stream
    * can contribute at most k of the stratum's true top-k, so no survivor
    * set can miss one. At 100 TB a single dominant stratum (one language
    * web corpus) no longer funnels through one task's sort; the second
    * window sorts k·salts rows, not the corpus. */
  def stratifiedTopKSalted(df: DataFrame, strata: Seq[String], key: Column,
                           k: Int, salts: Int = 16): DataFrame = {
    require(salts > 0, s"salts $salts must be positive")
    val saltCol = pmod(hex52(key), lit(salts.toLong))
    val w1 = Window.partitionBy((strata.map(col) :+ col("__salt")): _*)
      .orderBy(hashOf(key), key)
    val w2 = Window.partitionBy(strata.map(col): _*)
      .orderBy(hashOf(key), key)
    df.withColumn("__salt", saltCol)
      .withColumn("__r1", row_number().over(w1))
      .where(col("__r1") <= k)
      .withColumn("__r2", row_number().over(w2))
      .where(col("__r2") <= k)
      .drop("__salt", "__r1", "__r2")
  }

  /** Per-stratum selection under a weight budget: admit rows in hash order
    * until the running sum of `weight` exceeds the budget (the admitting
    * row is kept — "fill until full", so a stratum whose first document
    * exceeds the budget still contributes it). The token-budget cut of
    * corpus assembly, with tokens as the weight. */
  def weightBudget(df: DataFrame, strata: Seq[String], key: Column,
                   weight: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(hashOf(key), key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(weight).over(w))
      .where(col("__cum") - weight < budget) // strictly-before sum fits
      .drop("__cum")
  }

  /** 52-bit integer from the first 13 md5 hex chars — per-nibble ascii
    * arithmetic (no hex parse), so DuckDB reproduces it digit for digit. */
  private def hex52(key: Column): Column = {
    val h = md5(key.cast("string"))
    def nib(i: Int): Column = {
      val a = ascii(substring(h, i, 1))
      when(a <= 57, a - 48).otherwise(a - 87)
    }
    (1 to 13).map(i => nib(i).cast("long") * lit(1L << (4 * (13 - i))))
      .reduce(_ + _)
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    * per-stratum top-k by the key u^(1/w) — equivalently ln(u)/w — with u a
    * deterministic md5-derived uniform instead of an RNG. Rows are selected
    * with probability proportional to `weight` (e.g. quality score), yet
    * the same corpus always selects the same rows ([[hashFraction]]'s
    * reproducibility trade). The ES key is snapped to a fixed-point BIGINT
    * (nano-nat resolution) so ordering is integer-exact on both engines;
    * ties break by the key column. One window shuffle, WindowGroupLimit
    * keeps per-partition heaps instead of full sorts. */
  def weightedTopK(df: DataFrame, strata: Seq[String], key: Column,
                   weight: Column, k: Int): DataFrame = {
    // u = (hex52+1)/2^52 ∈ (0,1]; key_fp = floor(ln(u)/w · 1e9)
    val u = (hex52(key) + lit(1L)).cast("double") /
      lit(4503599627370496.0)
    val esFp = floor(log(u) / weight.cast("double") * lit(1.0e9))
      .cast("long")
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(col("__es").desc, key)
    df.withColumn("__es", esFp)
      .withColumn("__rank", row_number().over(w))
      .where(col("__rank") <= k).drop("__es", "__rank")
  }

  /** Corpus MIXING: per-stratum weight budgets (the DoReMi/Pile-style
    * domain-reweighting step — "this training mix is 60% web, 20% code,
    * 20% books" expressed as token budgets per domain). Same fill-until-
    * full semantics as [[weightBudget]], with the budget looked up per
    * stratum; a stratum absent from `budgets` contributes nothing (budget
    * 0 still admits no row because the first row's strictly-before sum is
    * 0 < 0 = false). One window shuffle, like every stratified variant. */
  def mixtureBudget(df: DataFrame, stratum: String, key: Column,
                    weight: Column, budgets: Map[String, Long]): DataFrame = {
    val w = Window.partitionBy(col(stratum))
      .orderBy(hashOf(key), key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budget = budgets.toSeq.sortBy(_._1)
      .foldLeft(lit(0L)) { case (acc, (s, b)) =>
        when(col(stratum) === s, lit(b)).otherwise(acc)
      }
    df.withColumn("__cum", sum(weight).over(w))
      .where(col("__cum") - weight < budget)
      .drop("__cum")
  }

  /** Temperature-based domain reweighting (the multilingual-LM α-sampling
    * rule, e.g. XLM-R's exponent: domain d gets share w_d^α / Σ w^α of the
    * output, α < 1 up-sampling small domains). α is fixed at 1/2 — the
    * common working point — because `sqrt` is IEEE-correctly-rounded on
    * every engine, so the whole quota computation (fixed-point sqrt,
    * integer sum, integer division) is bit-reproducible where a general
    * `pow` is not. Selection within a domain is the deterministic hash
    * order of [[stratifiedTopK]].
    *
    * Returns the selected rows with the domain's `quota` attached. Scale
    * shape: the domain-weight frame is domains-sized (tiny — aggregated
    * map-side, broadcast back), so the corpus pays one map-side-combined
    * aggregate and the one stratified-window shuffle. */
  def temperatureTopK(df: DataFrame, domainCol: String, key: Column,
                      weight: Column, totalRows: Long): DataFrame = {
    require(totalRows > 0, s"totalRows $totalRows must be positive")
    val scaled = df.groupBy(col(domainCol)).agg(sum(weight).as("__w"))
      .withColumn("__s",
        floor(sqrt(col("__w").cast("double")) * 1.0e6).cast("long"))
    val tot = scaled.agg(sum(col("__s")).as("__stot"))
    val quota = scaled.crossJoin(broadcast(tot))
      .withColumn("quota", expr(s"($totalRows * __s) DIV __stot"))
      .select(col(domainCol), col("quota"))
    val w = Window.partitionBy(col(domainCol)).orderBy(hashOf(key), key)
    df.join(broadcast(quota), Seq(domainCol))
      .withColumn("__rank", row_number().over(w))
      .where(col("__rank") <= col("quota"))
      .drop("__rank")
  }

  /** Fractional epoch repetition — the mixture step that repeats a source
    * a REAL number of times (a 1.7-epoch source: every doc twice? no —
    * every doc once, and a deterministic 70% of docs a second time).
    * Each row gets `floor(r)` full copies (`epoch` 0..⌊r⌋−1) plus one more
    * iff its salted hash clears the fractional threshold; r < 1
    * degenerates to plain deterministic downsampling, and a stratum absent
    * from `factors` passes through at exactly one epoch. The fractional
    * pick hashes `key || ":epoch"` so it is INDEPENDENT of any
    * [[hashFraction]] decision already applied to the same key.
    *
    * Scale shape: a scan-stage when-chain and one `explode` — no shuffle,
    * no driver state; output volume is the cost, which is the point. */
  def epochMixture(df: DataFrame, key: Column, strataCol: String,
                   factors: Map[String, Double]): DataFrame = {
    factors.foreach { case (s, r) =>
      require(r >= 0.0, s"factor $r for stratum $s must be >= 0") }
    val neverHex = "0" * 32
    val full = factors.foldLeft(lit(1L)) { case (acc, (s, r)) =>
      when(col(strataCol) === s, lit(math.floor(r).toLong)).otherwise(acc) }
    val fracThresh = factors.foldLeft(lit(neverHex)) { case (acc, (s, r)) =>
      when(col(strataCol) === s,
        lit(fracThreshold(r - math.floor(r)))).otherwise(acc) }
    val extra = (md5(concat(key.cast("string"), lit(":epoch"))) < fracThresh)
      .cast("long")
    df.withColumn("__n", full + extra)
      .where(col("__n") > 0L)
      .withColumn("epoch", explode(sequence(lit(0L), col("__n") - 1L)))
      .drop("__n")
  }
}
