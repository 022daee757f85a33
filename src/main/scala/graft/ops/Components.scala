package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair list — the step between
  * PAIRS and a usable dedup decision. LSH/SimHash emit pairs, but pairs
  * chain (A~B, B~C puts A and C in one cluster even if they never share a
  * bucket); what dedup keeps-one-of is the transitive CLUSTER. Reference
  * analog: the compactor's `latestForKey` keeps one entry per key
  * (`pulsar-broker/.../compaction/TwoPhaseCompactor.java:62-152`) — here the
  * "key" is the duplicate cluster itself and must first be computed from the
  * pair graph.
  *
  * Scale design: alternating large-star/small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", ACM SoCC 2014). Each
  * round is two shuffle stages keyed on the node id (a groupBy-min and a
  * co-partitioned join); the edge set only ever shrinks toward disjoint
  * min-rooted stars, and convergence is O(log² n) rounds on ANY graph —
  * a chained cluster of length L costs O(log L) rounds where naive label
  * propagation needs L. No neighbor list is ever collected: a 100M-member
  * boilerplate cluster contributes one min per partition to its hub's
  * aggregate, never an array. The driver loop is bounded (maxRounds) and
  * each round's result is localCheckpointed, so plan depth stays O(1)
  * instead of growing with rounds.
  */
object Components {

  /** (id, component) for every node appearing in `pairs`, where `component`
    * is the smallest id in the node's transitively-connected cluster. Ids
    * must be non-null and orderable (the component label is the cluster
    * minimum). Nodes not in any pair are absent — callers coalesce to the
    * node's own id (see [[keepBest]]).
    */
  def connected(pairs: DataFrame, aCol: String, bCol: String,
                maxRounds: Int = 50): DataFrame =
    connectedWithRounds(pairs, aCol, bCol, maxRounds)._1

  /** As [[connected]], also returning the number of alternating rounds the
    * algorithm took (exposed for tests asserting the O(log n) behavior). */
  def connectedWithRounds(pairs: DataFrame, aCol: String, bCol: String,
                          maxRounds: Int = 50): (DataFrame, Int) = {
    var e = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    val empty = e.select(col("a").as("id"), col("a").as("component")).limit(0)
    if (e.isEmpty) return (empty, 0)

    // Probabilistic edge-set signature: (count, sum of pair hashes, xor of
    // pair hashes). Two independent 64-bit digests alongside the count make
    // a false "unchanged" verdict vanishingly unlikely (~2⁻¹²⁸ per round),
    // at the cost of one cheap aggregate instead of an except() shuffle.
    // The sum runs in decimal(38,0) — long sums of 64-bit hashes overflow
    // under ANSI arithmetic.
    def sig(df: DataFrame): (Long, BigDecimal, Long) = {
      val r = df.agg(
        count(lit(1)),
        coalesce(sum(xxhash64(col("a"), col("b")).cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")),
        coalesce(expr("bit_xor(xxhash64(a, b))"), lit(0L))).head()
      (r.getLong(0), BigDecimal(r.getDecimal(1)), r.getLong(2))
    }

    // large-star: every node u links its LARGER neighbors to the smallest
    // node it can see (min of u and u's neighbors) — long chains contract
    // geometrically because minima hop two edges per round.
    def largeStar(cur: DataFrame): DataFrame = {
      val sym = cur.union(cur.select(col("b").as("a"), col("a").as("b")))
      val mins = sym.groupBy("a").agg(min("b").as("mn"))
      sym.join(mins, "a")
        .where(col("b") > col("a"))
        .select(col("b").as("a"), least(col("a"), col("mn")).as("b"))
        .where(col("a") =!= col("b"))
        .distinct()
    }

    // small-star: every node u re-points its SMALLER neighbors (and itself)
    // at the smallest of them — flattens local trees into stars.
    def smallStar(cur: DataFrame): DataFrame = {
      val dir = cur.select(greatest(col("a"), col("b")).as("u"),
        least(col("a"), col("b")).as("v"))
      val mins = dir.groupBy("u").agg(min("v").as("mn"))
      dir.join(mins, "u")
        .select(col("v").as("a"), col("mn").as("b"))
        .union(mins.select(col("u").as("a"), col("mn").as("b")))
        .where(col("a") =!= col("b"))
        .distinct()
    }

    var rounds = 0
    var prev = sig(e)
    var done = false
    while (!done) {
      rounds += 1
      require(rounds <= maxRounds,
        s"connected components did not converge in $maxRounds rounds")
      val l = largeStar(e).localCheckpoint()
      val s = smallStar(l).localCheckpoint()
      val (sl, ss) = (sig(l), sig(s))
      // converged only when BOTH operations fix the edge set — the paper's
      // fixed points (min-rooted disjoint stars) fix each individually, so
      // requiring both rules out a cycle of the composed map.
      done = sl == prev && ss == prev
      prev = ss
      e = s
    }

    // fixed point = stars: every edge is (member, root); roots appear only
    // on the b side and label themselves.
    val members = e.select(col("a").as("id"), col("b").as("component"))
    val roots = e.select(col("b").as("id"), col("b").as("component")).distinct()
    (members.unionByName(roots).distinct(), rounds)
  }

  /** Near-duplicate clusters of `docs`: MinHash+LSH candidate pairs
    * ([[MinHashLsh.candidatePairs]]) chained into components. One row per
    * CLUSTERED doc: (idCol, component). */
  def clusters(docs: DataFrame, idCol: String, textCol: String,
               shingleK: Int = 3, numHashes: Int = 16, bands: Int = 4,
               maxBucket: Int = 1024): DataFrame = {
    val pairs = MinHashLsh.candidatePairs(docs, idCol, textCol, shingleK,
      numHashes, bands, maxBucket)
    connected(pairs, "doc_a", "doc_b")
      .withColumnRenamed("id", idCol)
  }

  /** One kept representative per duplicate cluster (and every unclustered
    * doc keeps itself): the member with the highest `score`, ties broken by
    * the smallest id. A single map-side-combinable aggregate — no per-key
    * window sort, so a degenerate million-member cluster costs a min, not a
    * single-task sort. Returns (component, keeper id, n_members). */
  def keepBest(docs: DataFrame, idCol: String, comps: DataFrame,
               score: Column): DataFrame = {
    // comps is (node-id, component) whatever the id column was named —
    // [[connected]] emits "id", [[clusters]] re-labels it to the doc column
    val c = comps.select(col(comps.columns.head).as(idCol), col("component"))
    docs.join(c, Seq(idCol), "left")
      .withColumn("__c", coalesce(col("component"), col(idCol)))
      .groupBy(col("__c").as("component"))
      .agg(
        // min over (−score, id): highest score wins, then smallest id —
        // deterministic without assuming anything about id ordering ties.
        min_by(col(idCol), struct(negate(score), col(idCol)))
          .as("keeper_id"),
        count(lit(1)).as("n_members"))
  }
}
