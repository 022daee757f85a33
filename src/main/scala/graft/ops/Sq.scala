package graft.ops

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (int8) quantization — the 4× compression point BETWEEN raw
  * float32 vectors and [[Pq]]'s 64× codes, and the first thing a vector
  * store reaches for because it is nearly free: each dimension gets an
  * independent affine map onto [0, 255] (per-dim min/max over the corpus),
  * encode/decode are pure scan-stage expressions, and search scores the
  * FULL-precision query against reconstructed corpus vectors
  * (asymmetric), shortlists, then re-ranks the shortlist exactly — the
  * same ADC+R discipline as [[Pq.adcTopKRerank]] at a milder compression
  * point.
  *
  * Determinism: codes are `floor(affine + 0.5)` integers (the fixed-point
  * convention), so encode is exactly reproducible; reconstruction and
  * scoring are fixed-form IEEE arithmetic the SQL oracle replays.
  * Degenerate dimensions (max == min over the corpus) encode to 0 and
  * reconstruct to the constant.
  *
  * Scale shape: training is ONE map-side-combined min/max aggregate (2·d
  * doubles to the driver); encoding rides the corpus scan; search
  * broadcasts the query side and streams the code table once.
  *
  * Reference analog: the same tiered-representation contract as PQ —
  * compact form on the scan path, authoritative rows behind it
  * (tiered-storage offload + read-back). */
object Sq {

  /** Per-dimension affine quantizer bounds. */
  final case class Model(mins: Array[Double], maxs: Array[Double]) {
    require(mins.length == maxs.length && mins.nonEmpty)
  }

  /** One min/max aggregate over the corpus — 2·dim doubles. */
  def train(df: DataFrame, vecCol: String, dim: Int): Model = {
    val aggs = (1 to dim).flatMap(i => Seq(
      min(element_at(col(vecCol), i).cast("double")).as(s"mn$i"),
      max(element_at(col(vecCol), i).cast("double")).as(s"mx$i")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    Model(Array.tabulate(dim)(i => r.getDouble(2 * i)),
      Array.tabulate(dim)(i => r.getDouble(2 * i + 1)))
  }

  private def lits(a: Array[Double]): Column = typedlit(a.toSeq)

  /** int8 codes for `vec` (array of longs in [0, 255] — parquet stores
    * them narrow; the arithmetic stays integer-exact). */
  def encodeExpr(vec: Column, m: Model): Column = {
    val mn = lits(m.mins); val mx = lits(m.maxs)
    transform(sequence(lit(1), lit(m.mins.length)), i => {
      val x = element_at(vec, i).cast("double")
      val lo = element_at(mn, i); val hi = element_at(mx, i)
      when(hi === lo, lit(0L))
        .otherwise(floor((x - lo) * 255.0 / (hi - lo) + 0.5).cast("long"))
    })
  }

  /** Reconstructed (approximate) vector for a code array. */
  def reconstructExpr(codes: Column, m: Model): Column = {
    val mn = lits(m.mins); val mx = lits(m.maxs)
    transform(sequence(lit(1), lit(m.mins.length)), i => {
      val lo = element_at(mn, i); val hi = element_at(mx, i)
      lo + element_at(codes, i).cast("double") * (hi - lo) / 255.0
    })
  }

  /** Asymmetric search + exact re-rank: approximate cosine of the
    * full-precision query against RECONSTRUCTED corpus vectors nominates
    * `shortlist` candidates; only those rows re-score exactly. Ties break
    * by neighbor id at both stages. Returns (query_id, neighbor_id, sim,
    * rank) with exact sims. */
  def topKRerank(queries: DataFrame, corpus: DataFrame, idCol: String,
                 vecCol: String, m: Model, k: Int,
                 shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val c = Par.spread(corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("__cv")))
      .withColumn("__rv", reconstructExpr(encodeExpr(col("__cv"), m), m))
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv")))
    val scored = c.crossJoin(q)
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("asim", VectorFunctions.cosine(col("__qv"), col("__rv")))
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("asim").desc, col("neighbor_id"))
    val short = scored.withColumn("__r", row_number().over(w1))
      .where(col("__r") <= shortlist)
      .withColumn("sim", VectorFunctions.cosine(col("__qv"), col("__cv")))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    short.withColumn("rank", row_number().over(w2)).where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("sim"), 6).as("sim"), col("rank"))
  }
}
