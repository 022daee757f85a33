package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Damped PageRank over a link graph (Brin & Page 1998) — the host-level
  * reputation signal web-corpus curation uses alongside quality rules
  * (Common Crawl publishes exactly this as its host-level ranking): a few
  * fixed power-iteration rounds over (src, dst) edges.
  *
  * '''Integer-exact discipline.''' Ranks live in FIXED POINT (`scale`
  * units, longs). Every step — uniform init, per-edge contribution
  * `rank div outdeg`, damping `(85·x) div 100`, dangling-mass
  * redistribution `dang div n` — is integer arithmetic, so distributed
  * sums are order-independent and the DuckDB oracle replays the
  * iteration bit-for-bit (a float PageRank would hash-diverge on
  * partition-order addition alone). Floor losses are deterministic and
  * identical in both engines.
  *
  * '''Scale shape.''' The rank table is NODE-sized (hosts, not
  * documents — orders of magnitude smaller than the corpus). Each
  * iteration costs one join of ranks onto edges (both keyed by `src` —
  * co-partitionable, and outdeg is a node-sized broadcast candidate) and
  * one map-side-combined sum by `dst`; the dangling mass is a one-row
  * aggregate broadcast back. Nothing in the loop touches document
  * payloads, and iteration count is a fixed constant.
  *
  * Reference analog: the broker's load manager ranks brokers/bundles by
  * iteratively-updated load scores to steer placement
  * (pulsar-broker/.../loadbalance/impl/ModularLoadManagerImpl.java) —
  * a small-table iterative scoring pass beside the data path.
  */
object PageRank {

  /** Fixed-point rank per node after `iters` damped iterations.
    * Returns (node, rank) with rank in `scale` units; d = 0.85 as the
    * exact rational 85/100. Edges are dedup'd; nodes = src ∪ dst;
    * dangling nodes (no out-edges) redistribute their mass uniformly. */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String, iters: Int,
            scale: Long = 1000000000000L): DataFrame =
    ranksFrom(edges, srcCol, dstCol, iters, scale, init = None)

  /** The incremental (crawl-delta) face: power iteration WARM-STARTED
    * from a previous snapshot's rank vector instead of uniform mass.
    * `init` is that previous `(node, rank)` table; nodes NEW to the
    * graph (appended by the delta) start at the uniform `scale / n`,
    * and the combined vector is RENORMALIZED back to total mass `scale`
    * when the delta pushed it above (`(rank·scale) div total` — without
    * this the surplus mass decays at only 0.85/round and a warm start
    * converges SLOWER than cold, measured 25 vs 11 rounds on the
    * planted graph). The damped iteration is a contraction toward one
    * fixed point regardless of the starting vector, so a warm start
    * near last snapshot's answer needs FEWER rounds for the same
    * movement tolerance (spec'd quantitatively in PageRankWarmSpec) —
    * the point of appending edge deltas ([[EdgeIndex]]) instead of
    * re-extracting: at 100 TB the re-rank after a batch-sized crawl
    * delta touches only the node/edge-sized store AND converges in a
    * fraction of the cold-start rounds. Every step stays integer-exact,
    * so the two-phase computation replays bit-for-bit oracle-side
    * (`q_pagerank_incremental`). When the delta adds nodes (so the
    * renormalizing multiply runs), `scale` must stay ≤ 2.1e9 to keep
    * `rank·scale` inside 2^63 — rank precision 1e-9 of total mass,
    * plenty for the top-k weighting the signal feeds. */
  def ranksWarm(edges: DataFrame, srcCol: String, dstCol: String,
                iters: Int, init: DataFrame,
                scale: Long = 1000000000000L): DataFrame =
    ranksFrom(edges, srcCol, dstCol, iters, scale, init = Some(init))

  private def ranksFrom(edges: DataFrame, srcCol: String, dstCol: String,
                        iters: Int, scale: Long,
                        init: Option[DataFrame]): DataFrame = {
    require(iters >= 0 && iters <= 50, s"bad iteration count $iters")
    // total rank mass is conserved at ~scale (the warm path renormalizes
    // its start vector down to ≤scale before iterating), so the damping
    // multiply sees at most 85·(in_sum + dang/n) ≤ 85·2·scale — enforce
    // the headroom instead of documenting it (the HITS discipline)
    require(scale >= 1L && scale <= Long.MaxValue / 170L,
      s"PageRank overflow: 85*2*scale must stay under 2^63, got $scale")
    // edges/nodes/outdeg are reused every round — materialize once, or
    // the iterative lineage re-derives them per reference and the final
    // plan grows exponentially with the iteration count
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct().persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    // n is a scalar COUNT over the node table — the one bounded driver
    // value the algorithm needs (it parameterizes the integer formulas)
    val n = nodes.count()
    require(n > 0, "PageRank: empty graph")
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).persist()
    val base = 15L * scale / (100L * n)
    // start vector: uniform scale/n, or the previous snapshot's ranks
    // with delta nodes (absent from init) at the uniform value — a
    // node-sized left join, evaluated once before the loop. Delta nodes
    // push the total above scale; renormalize it back down so the
    // iteration starts at fixed-point mass (see [[ranksWarm]]).
    var rank = init match {
      case None => nodes.select(col("node"), lit(scale / n).as("rank"))
      case Some(prev) =>
        val raw = nodes.join(
            prev.select(col("node"), col("rank").cast("long").as("__pr")),
            Seq("node"), "left")
          .select(col("node"),
            coalesce(col("__pr"), lit(scale / n)).as("rank"))
          .localCheckpoint(true)
        // one-row total — the bounded driver value that decides (and
        // parameterizes) the renormalization
        val total = raw.agg(coalesce(sum(col("rank")), lit(0L))).head()
          .getLong(0)
        if (total <= scale) raw
        else {
          require(scale <= 2100000000L,
            s"PageRank warm rescale overflow: rank*scale needs scale <= " +
              s"2.1e9 when the delta adds nodes, got $scale")
          // a legitimate seed is a ≤scale snapshot plus ≤scale uniform
          // delta mass; enforce it so rank·scale stays ≤ 2·scale² < 2^63
          require(total <= 2L * scale,
            s"PageRank warm seed mass $total exceeds 2*scale — not a " +
              "snapshot+delta vector")
          raw.select(col("node"),
              expr(s"(rank * ${scale}L) div ${total}L").as("rank"))
            .localCheckpoint(true)
        }
    }
    // dangling mass rides INLINE as a window-over-() instead of a one-row
    // aggregate broadcast back: the broadcast build was its own driver job
    // per round (2 jobs/round where the dependencies need one). The rank
    // frame is node-COMPLETE by construction (init selects from `nodes`,
    // each round rebuilds every row), so the next vector is built from the
    // checkpointed rank itself: a left join marks out-edge-less nodes and
    // the window sums their rank over the (node-sized, post-checkpoint)
    // frame. Arithmetic unchanged — same dang value, same integer formula.
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(Seq.empty[org.apache.spark.sql.Column]: _*)
    for (_ <- 1 to iters) {
      val contrib = e.join(rank.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst").as("node"), expr("rank div outdeg").as("c"))
      val inSum = contrib.groupBy("node").agg(sum(col("c")).as("in_sum"))
      // node-sized: eagerly materialized per round, truncating the
      // lineage so the job graph stays O(1) per iteration (the classic
      // iterative-algorithm discipline; content is integer-deterministic,
      // so checkpointing cannot change any value)
      rank = rank
        .join(outdeg.select(col("src").as("node"), lit(1).as("__o")),
          Seq("node"), "left")
        .join(inSum, Seq("node"), "left")
        .withColumn("dang",
          sum(when(col("__o").isNull, col("rank")).otherwise(lit(0L)))
            .over(wAll))
        .select(col("node"),
          (lit(base) +
            expr(s"(85 * (coalesce(in_sum, 0) + (dang div $n))) div 100"))
            .as("rank"))
        .localCheckpoint(true)
    }
    e.unpersist(); nodes.unpersist(); outdeg.unpersist()
    rank
  }

  /** Top-k nodes by rank (rank desc, node asc — deterministic): the
    * reputation head a curation run whitelists or weights by. */
  def topRanks(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, k: Int): DataFrame =
    ranks(edges, srcCol, dstCol, iters)
      .orderBy(col("rank").desc, col("node")).limit(k)
}
