package graft.ops

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch term frequencies — bounded-memory frequency estimation
  * for corpora whose vocabulary does not fit anywhere (URLs, n-grams,
  * entity mentions at 100 TB): d×w integer cells replace an unbounded
  * term dictionary, at the cost of one-sided overcounting.
  *
  * Reference analog: per-topic rate/stats aggregation keeps bounded
  * counters instead of per-message state (pulsar-broker/.../stats/); HLL
  * distinct-count parity already exists (`q_approx_distinct`) — this adds
  * the frequency-sketch sibling.
  *
  * '''Determinism contract.''' Row hashes are md5-nibble arithmetic
  * (seeded `md5(r ‖ ':' ‖ term)`, first two hex chars → bucket 0..w−1), so
  * both engines place every token in identical cells; all cells and
  * estimates are exact integer aggregations. The classic CMS guarantee is
  * kept as data: `est ≥ exact` for every term (one-sided error), checkable
  * row-by-row by the oracle.
  *
  * '''Scale shape.''' The sketch is a groupBy over (row, bucket) — d·w
  * cells regardless of corpus size, map-side combined. Estimation joins
  * the (broadcast, d·w-row) sketch back onto whatever terms are being
  * queried; no unbounded state anywhere.
  */
object Sketches {

  /** Bucket 0..255 for sketch row `r`: first two md5 hex nibbles of the
    * seeded term — ascii arithmetic only, mirrored in SQL. */
  private def bucket(r: Int, term: Column): Column = {
    val h = md5(concat(lit(s"$r:"), term))
    def nib(i: Int): Column = {
      val a = ascii(substring(h, i, 1))
      when(a <= 57, a - 48).otherwise(a - 87)
    }
    nib(1) * 16 + nib(2)
  }

  /** CMS estimate vs exact count for every distinct token in the corpus:
    * (term, exact_n, cms_est, admissible). `admissible` must be true for
    * every row — the one-sided CMS error bound as a hard invariant. */
  def cmsTermCounts(docs: DataFrame, textCol: String,
                    depth: Int = 4): DataFrame = {
    val toks = docs.select(explode(tokens(col(textCol))).as("t"))
      .where(col("t") =!= "")
    val exact = toks.groupBy(col("t")).agg(count(lit(1)).as("exact_n"))
    // a cell's count = Σ exact_n over the terms hashing into it, so the
    // d-way explode runs over the TERMS frame (vocabulary-sized, exchange
    // reused from `exact`) — the corpus is tokenized and counted ONCE
    val cells = exact
      .select(explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"), bucket(r, col("t")).as("b"),
          col("exact_n").as("n"))): _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(sum(col("rb.n")).as("cell"))
    // estimate = min over rows of the term's cell — join the broadcast
    // sketch onto the queried terms
    val est = exact.select(col("t"))
      .select(col("t"), explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"), bucket(r, col("t")).as("b"))): _*)).as("rb"))
      .select(col("t"), col("rb.r").as("r"), col("rb.b").as("b"))
      .join(broadcast(cells), Seq("r", "b"))
      .groupBy(col("t")).agg(min(col("cell")).as("cms_est"))
    exact.join(est, "t")
      .select(col("t").as("term"), col("exact_n"), col("cms_est"),
        (col("cms_est") >= col("exact_n")).as("admissible"))
  }

  /** Heavy hitters with the sketch's one-sided recall guarantee: every term
    * whose CMS estimate reaches a 1/k share of the token stream. Because
    * `est ≥ exact`, the candidate set PROVABLY contains every true heavy
    * hitter (`is_heavy` marks them) — the sketch can only over-admit,
    * never miss. All comparisons are integer cross-multiplies, so both
    * engines agree bit-for-bit.
    *
    * Scale shape: the candidate filter runs over the d·256-cell sketch
    * join, not the corpus — at 100 TB the only corpus-sized work is the
    * same two map-side-combined aggregations `cmsTermCounts` already pays.
    */
  def heavyHitters(docs: DataFrame, textCol: String, k: Int,
                   depth: Int = 4): DataFrame = {
    val scored = cmsTermCounts(docs, textCol, depth)
    // the stream total is the sum of the per-term exact counts — derived
    // from the terms-sized frame, NOT a third corpus scan
    val total = scored.agg(sum(col("exact_n")).as("n_total"))
    scored.crossJoin(broadcast(total))
      .where(col("cms_est") * k >= col("n_total"))
      .select(col("term"), col("exact_n"), col("cms_est"), col("n_total"),
        (col("exact_n") * k >= col("n_total")).as("is_heavy"))
  }
}
