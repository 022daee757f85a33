package graft.ops

import graft.functions.TextFunctions.{hash16, tokens}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling (DSIR, Xie et al. 2023 —
  * public arXiv:2302.03169): score every raw document by how much its
  * hashed-unigram distribution looks like a TARGET domain versus the raw
  * corpus, then keep the top-weighted slice. The "give me more data that
  * looks like my curated seed set" step of corpus assembly.
  *
  * Feature space: [[graft.functions.TextFunctions.hash16]] buckets (md5
  * nibbles → 0..65535), the same oracle-reproducible token hash the SimHash
  * operator uses. Bucket log-ratios ln(p_target[b]/p_raw[b]) use Laplace
  * α=1 smoothing over the 2¹⁶ bucket space.
  *
  * '''Determinism contract.''' Each bucket's log-ratio is a fixed-point
  * BIGINT (ln of a ratio of integer counts — bit-identical operands on both
  * engines); a document's weight is the INTEGER sum Σ count_d[b]·lr_fp[b],
  * exact under any aggregation order. Selection is ORDER BY (weight DESC,
  * id) LIMIT n — total-ordered, no RNG (DSIR's Gumbel-noise resampling
  * step is deliberately replaced by the deterministic top-n, the same
  * reproducibility trade [[Sampling]] makes).
  *
  * '''Scale shape.''' Two map-side-combined bucket-count aggregations
  * (target, raw) produce a table bounded by 65 536 rows — broadcast to the
  * per-document scoring join; the only corpus-sized shuffles key on
  * (doc, bucket) and (doc). Top-n is TakeOrderedAndProject (per-partition
  * heads, no global sort materialization).
  */
object Dsir {

  private def fp(x: Column): Column =
    floor(x * lit(1000000.0) + lit(0.5)).cast("long")

  /** Per-document importance weight (fixed-point): Σ over the doc's token
    * occurrences of ln(p_target[bucket]/p_raw[bucket]). Raw distribution is
    * the WHOLE corpus (target included — DSIR's raw pool contains the
    * target's look-alikes; excluding it would just shift every weight). */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        isTarget: Column): DataFrame = {
    val buckets = 65536L
    val toks = docs
      .select(col(idCol), isTarget.as("__tgt"),
        explode(tokens(col(textCol))).as("t"))
      .where(col("t") =!= "")
      .select(col(idCol), col("__tgt"), hash16(col("t")).as("b"))
    val target = toks.where(col("__tgt"))
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val raw = toks.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val totals = toks.where(col("__tgt")).agg(count(lit(1)).as("tt"))
      .crossJoin(toks.agg(count(lit(1)).as("tr")))
    // every populated raw bucket gets a ratio; target-absent buckets take
    // the smoothed ct=0 mass. ln(((ct+1)/(T+B)) / ((cr+1)/(R+B))) written
    // in exactly this op order on both engines.
    val lr = raw.join(target, Seq("b"), "left").crossJoin(broadcast(totals))
      .select(col("b"), fp(log(
        ((coalesce(col("ct"), lit(0L)) + lit(1L)).cast("double") /
          (col("tt") + lit(buckets)).cast("double")) /
          ((col("cr") + lit(1L)).cast("double") /
            (col("tr") + lit(buckets)).cast("double")))).as("lr_fp"))
    val perDoc = toks.groupBy(col(idCol), col("b"))
      .agg(count(lit(1)).as("cnt"))
    perDoc.join(broadcast(lr), "b")
      .groupBy(col(idCol))
      .agg(sum(col("cnt") * col("lr_fp")).as("weight_fp"))
  }

  /** Deterministic DSIR selection: top-n documents by importance weight
    * (ties broken by id — total order). */
  def selectTopN(docs: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, n: Int): DataFrame =
    importanceWeights(docs, idCol, textCol, isTarget)
      .orderBy(col("weight_fp").desc, col(idCol))
      .limit(n)
}
