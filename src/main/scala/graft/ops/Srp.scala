package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sign-random-projection sketches (Charikar STOC'02 — SimHash for
  * VECTORS): each of `nBits` fixed hyperplanes contributes one bit (which
  * side of the plane the vector falls on), packed into a single BIGINT;
  * hamming distance between sketches estimates angular distance, so a
  * `bit_count(xor())` scan nominates cosine-neighbor candidates at 64×
  * compression — the bit-sketch sibling of [[Pq]] (codebooks) and [[Sq]]
  * (scalar affine).
  *
  * '''Integer-exact discipline.''' Planes are md5-derived integer
  * components (hash16(j:i) − 32768, zero data dependence); the projected
  * vector is the [[Sq]] int8 code CENTERED at 128 — so every dot product
  * is an exact integer sum, the sign is unambiguous, and the DuckDB
  * oracle reproduces every bit. 48 bits are packed (1L << j stays
  * positive), hamming is `bit_count(xor)` on one BIGINT.
  *
  * '''Scale shape.''' Encoding is scan-stage expression work over the
  * stored int8 codes; search is the [[Sq.topKRerank]] shape — broadcast
  * queries, ONE corpus scan comparing 8-byte sketches (no float math
  * until the shortlist), exact cosine re-rank on `shortlist` rows only.
  */
object Srp {

  val DefaultBits = 48

  /** Deterministic integer hyperplanes: p(j)(i−1) = hash16("j:i") −
    * 32768 — the md5-nibble hash the whole text stack uses, so the
    * oracle derives the identical planes in SQL. */
  def planes(nBits: Int, dim: Int): Array[Array[Long]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nBits) { j =>
      Array.tabulate(dim) { i0 =>
        val h = md.digest(s"$j:${i0 + 1}".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        java.lang.Integer.parseInt(h.substring(0, 4), 16).toLong - 32768L
      }
    }
  }

  /** Packed `nBits`-bit sketch of an int8 code array (the [[Sq]]
    * encoding): bit j set iff Σ_i p(j,i)·(code_i − 128) > 0. Fused
    * native expression ([[graft.functions.SrpSketchBits]]) — the
    * compositional HOF tree below costs ~3k interpreted element_at
    * calls per row at 48×64 and made the sketch projection dominate the
    * whole search (113 s of a 232 s board at sf0.1, measured r9). */
  def sketchExpr(codes: Column, pl: Array[Array[Long]]): Column = {
    val nBits = pl.length; val dim = pl(0).length
    require(nBits >= 1 && nBits <= 62, s"bad bit count $nBits")
    graft.functions.GraftExpressions.srp_sketch_bits(
      codes, pl.flatten, nBits, dim)
  }

  /** The compositional built-ins-only form — kept as the differential
    * reference for the fused expression's bit-identity spec. */
  private[graft] def sketchExprCompositional(
      codes: Column, pl: Array[Array[Long]]): Column = {
    val nBits = pl.length; val dim = pl(0).length
    require(nBits >= 1 && nBits <= 62, s"bad bit count $nBits")
    val plLit = typedlit(pl.map(_.toSeq).toSeq)
    val p2 = typedlit(Seq.tabulate(nBits)(j => 1L << j))
    val centered = transform(codes, c => c - lit(128L))
    aggregate(sequence(lit(0), lit(nBits - 1)), lit(0L), (acc, j) => {
      val row = element_at(plLit, j + lit(1))
      val s = aggregate(sequence(lit(1), lit(dim)), lit(0L),
        (a, i) => a + element_at(row, i) * element_at(centered, i))
      acc + when(s > 0L, element_at(p2, j + lit(1))).otherwise(lit(0L))
    })
  }

  /** Hamming-shortlist + exact-cosine re-rank: (query_id, neighbor_id,
    * sim, rank) with exact sims; shortlist ties break (hamming asc,
    * neighbor asc), final ties (sim desc, neighbor asc). */
  def topKRerank(queries: DataFrame, corpus: DataFrame, idCol: String,
                 vecCol: String, m: Sq.Model, nBits: Int, k: Int,
                 shortlist: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pl = planes(nBits, m.mins.length)
    def sk(df: DataFrame, id: String) = df.select(
      col(idCol).as(id), col(vecCol).as(s"__v_$id"),
      sketchExpr(Sq.encodeExpr(col(vecCol), m), pl).as(s"__sk_$id"))
    val q = sk(queries, "query_id")
    val c = Par.spread(sk(corpus, "neighbor_id"))
    val ham = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("__hm",
        bit_count(col("__sk_query_id").bitwiseXOR(col("__sk_neighbor_id"))))
    val wham = Window.partitionBy(col("query_id"))
      .orderBy(col("__hm").asc, col("neighbor_id").asc)
    val cand = ham.withColumn("__ar", row_number().over(wham))
      .where(col("__ar") <= shortlist)
      .withColumn("sim", graft.functions.VectorFunctions
        .cosine(col("__v_query_id"), col("__v_neighbor_id")))
    val w2 = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w2))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("sim"), 6).as("sim"), col("rank"))
  }
}
