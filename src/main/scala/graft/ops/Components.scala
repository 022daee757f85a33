package graft.ops

import java.io.File

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    * algorithm took (exposed for tests asserting the O(log n) behavior).
    *
    * Lineage truncation between rounds: with a session checkpoint dir
    * configured (the real-cluster deployment shape), each round's edge set
    * is written to `<checkpointDir>/graft-cc/<uuid>/rN` and read back —
    * reliable (survives executor loss, where localCheckpoint blocks die
    * with their executor), computed once (Dataset.checkpoint would run the
    * plan twice), and BOUNDED: a round's file set is deleted as soon as no
    * later round can read it, so a call holds at most two edge-set copies
    * on disk and leaves exactly one (backing the returned frame). Lazy
    * consumers clean the `graft-cc/` parent once results are consumed;
    * eager consumers use [[connectedThenClean]], which leaves nothing.
    * Without a checkpoint dir: localCheckpoint (local mode, tests). */
  def connectedWithRounds(pairs: DataFrame, aCol: String, bCol: String,
                          maxRounds: Int = 50): (DataFrame, Int) = {
    val (df, rounds, _) = connectedImpl(pairs, aCol, bCol, maxRounds)
    (df, rounds)
  }

  /** Run the closure, hand the result to `consume` (which must FULLY read
    * it — write it out, collect it), then delete the call's reliable-
    * materialization residue. The shape for eager consumers like
    * [[ComponentsIndex.compact]]: under the cron maintenance loop nothing
    * accumulates beneath the checkpoint dir at all. */
  def connectedThenClean[T](pairs: DataFrame, aCol: String, bCol: String,
                            maxRounds: Int = 50)(
      consume: DataFrame => T): T = {
    val (df, _, residue) = connectedImpl(pairs, aCol, bCol, maxRounds)
    // finally: a consumer that throws abandons the frame, so its backing
    // files are garbage either way — without this, every failed cron
    // compact would leak one residue dir forever
    try consume(df)
    finally residue.foreach(rmPath(pairs.sparkSession, _))
  }

  private def rmPath(spark: SparkSession, p: String): Unit = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(hp, true)
  }

  private def connectedImpl(pairs: DataFrame, aCol: String, bCol: String,
                            maxRounds: Int): (DataFrame, Int, Option[String]) = {
    val spark = pairs.sparkSession
    val ckptBase = spark.sparkContext.getCheckpointDir.map(d =>
      s"$d/graft-cc/${java.util.UUID.randomUUID()}")
    def rm(p: String): Unit = rmPath(spark, p)
    var written = List.empty[String] // newest first
    var seq = 0
    def materialize(df: DataFrame): DataFrame = ckptBase match {
      case Some(base) =>
        val p = s"$base/r$seq"; seq += 1
        df.write.parquet(p)
        // each round reads only the immediately previous materialization
        // (and its signature) — anything older is unreachable
        written = p :: written
        written.drop(2).foreach(rm)
        written = written.take(2)
        spark.read.parquet(p)
      case None => df.localCheckpoint()
    }

    var e = materialize(pairs.select(col(aCol).as("a"), col(bCol).as("b"))
      .where(col("a") =!= col("b"))
      .distinct())
    val empty = e.select(col("a").as("id"), col("a").as("component")).limit(0)

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

    // once the loop (or an early return) settles on a final frame, only
    // its own files remain on disk
    def retainOnlyNewest(): Unit = {
      written.drop(1).foreach(rm)
      written = written.take(1)
    }

    var rounds = 0
    // the first signature doubles as the emptiness check — no separate
    // isEmpty job
    var prev = sig(e)
    if (prev._1 == 0) { retainOnlyNewest(); return (empty, 0, ckptBase) }
    var done = false
    while (!done) {
      rounds += 1
      require(rounds <= maxRounds,
        s"connected components did not converge in $maxRounds rounds")
      val l = materialize(largeStar(e))
      val s = materialize(smallStar(l))
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
    retainOnlyNewest()
    val members = e.select(col("a").as("id"), col("b").as("component"))
    val roots = e.select(col("b").as("id"), col("b").as("component")).distinct()
    (members.unionByName(roots).distinct(), rounds, ckptBase)
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
    // [[connected]] emits "id", [[clusters]] re-labels it to the doc
    // column. Resolve the node-id column BY NAME (the one that is not
    // "component"), not by position: a (component, id)-ordered frame would
    // otherwise silently swap labels for ids and keep the wrong docs.
    val idIn = comps.columns.filterNot(_ == "component") match {
      case Array(one) => one
      case other => throw new IllegalArgumentException(
        s"comps must be (node-id, component); got ${other.mkString(",")} + component=" +
          comps.columns.contains("component"))
    }
    val c = comps.select(col(idIn).as(idCol), col("component"))
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

  /** The deduplicated corpus itself — every row whose id is its cluster's
    * keeper ([[keepBest]] semantics) — the frame a pipeline feeds
    * downstream. Two scans of `docs` (the keeper aggregate and the
    * semi-join probe side); the semi-join never widens docs with extra
    * columns or duplicate rows. */
  def dropDuplicates(docs: DataFrame, idCol: String, comps: DataFrame,
                     score: Column): DataFrame =
    docs.join(keepBest(docs, idCol, comps, score)
      .select(col("keeper_id").as(idCol)), Seq(idCol), "left_semi")
}

/** Persisted, incrementally-maintained duplicate clusters — union-find as a
  * table. Continuous ingest (e.g. [[MinHashIndex.addAndFindPairs]] under the
  * cron loop) emits near-dup pairs batch by batch; this index accumulates
  * them as a link table and resolves transitive clusters on demand, so the
  * corpus is never re-paired.
  *
  * LSM shape: [[addPairs]] appends O(batch) link rows into the live
  * generation's `delta/` and does nothing else — the cost of ingesting a
  * batch tracks the batch. [[compact]] rewrites everything into flat
  * member→root stars under `stars/` in a fresh generation (atomic pointer
  * swap via the shared [[GenStore]]), restoring O(nodes) state no matter
  * how many batches appended. [[resolveAll]] is INCREMENTAL against that
  * snapshot: delta links are contracted onto their stars' roots (each root
  * is its component's minimum, so the contracted minimum is the true
  * minimum), the alternating-star closure runs over the contracted graph
  * only — O(delta) edges, rounds tracking the delta — and untouched stars
  * pass through a single relabel join. The reference-analog shape: cursor
  * recovery reads the last snapshot plus the tail, not the whole ledger
  * (`MessageDeduplication.recoverSequenceIdsMap`,
  * pulsar-broker/.../persistent/MessageDeduplication.java). Run compact on
  * the same maintenance cadence as the other stores
  * ([[graft.sources.CronTriggerer]]).
  *
  * Evidence model: every stored row is headed by the node it is evidence
  * FOR. Raw pairs are appended in both directions, so each endpoint heads
  * one copy; compaction writes each member's star (and each root's
  * self-row) headed by that node, stamped with the node's own newest link
  * ord. Retention ([[compact]]'s `retainOrdGe`) therefore expires NODES
  * whose own evidence is stale — a fresh link elsewhere in the cluster can
  * never launder an expired member back to life. Expiring a node through
  * which a compacted cluster was contracted dissolves the paths that ran
  * through it (conservative: post-compaction retention may split more than
  * link-level retention would have — it never keeps more).
  *
  * Crash contract: appends are plain parquet appends of DISTINCT pairs, so
  * a replayed batch re-appends identical links — duplicate link rows never
  * change the resolved clusters (idempotent replay). Appends/compacts are
  * serialized by a single driver, like the other stores.
  *
  * Reference analog: compacted subscription state that outlives any run
  * (`MessageDeduplication.takeSnapshot`,
  * pulsar-broker/.../persistent/MessageDeduplication.java).
  */
class ComponentsIndex(spark: SparkSession, path: String,
                      strictOrd: Boolean = false) {

  private val gens = new GenStore(path)

  // shared ord-discipline advisory: pair evidence is stamped `ord` and
  // compact's retention prunes on it — a fresh-checkpoint restart's
  // reset ords would mis-age evidence (see [[OrdHighWater]])
  private val hwm = new OrdHighWater(new java.io.File(path), "components",
    strictOrd)

  private def appendGen(): File = gens.liveOrCreate()

  private def parquetFilesIn(dir: File): Array[File] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))

  private def readDir(dir: File): Option[DataFrame] =
    if (parquetFilesIn(dir).isEmpty) None
    else Some(spark.read.parquet(dir.getAbsolutePath))

  /** Flat member→root stars (a, b=root, ord) from the last [[compact]];
    * absent before the first one. One row per known node (roots label
    * themselves). */
  private def stars(): Option[DataFrame] =
    gens.currentGen().flatMap(g => readDir(new File(g, "stars")))

  /** Post-compact link appends. Legacy root-level files (the
    * pre-subdirectory layout wrote both appends and stars flat into the
    * generation) are read as plain links too — a star row IS a link of the
    * same component, so treating it as one only forgoes the snapshot
    * shortcut, never correctness. Listed explicitly so the read never
    * trips over the subdirectories. */
  private def delta(): Option[DataFrame] = gens.currentGen().flatMap { g =>
    val legacy = parquetFilesIn(g)
    val legacyDf =
      if (legacy.isEmpty) None
      else Some(spark.read.parquet(legacy.map(_.getAbsolutePath).toSeq: _*))
    val d = readDir(new File(g, "delta"))
    (legacyDf, d) match {
      case (Some(l), Some(x)) => Some(l.unionByName(x))
      case (l, x) => l.orElse(x)
    }
  }

  /** Everything stored, viewed as link rows (a, b, ord) — the retention /
    * evidence domain. */
  private def allRows(): Option[DataFrame] = (stars(), delta()) match {
    case (Some(s), Some(d)) => Some(s.unionByName(d))
    case (s, d) => s.orElse(d)
  }

  /** Wall-clock-stamped append — for stores whose evidence-age axis IS
    * ingest time. Refused on a strict-ord store (one ~epoch-ms stamp
    * onto an epoch-id-fed store would advance the high-water mark past
    * every future epoch id and wedge all later appends) — the same
    * overload shape as [[MinHashIndex]]'s no-ord `addAndFindPairs`:
    * the explicit-ord face accepts ANY Long, including the negative
    * monotone stamps an in-band sentinel would silently remap to
    * wall-clock. */
  def addPairs(pairs: DataFrame, aCol: String, bCol: String): Unit = {
    require(!strictOrd, "a strict-ord ComponentsIndex requires an " +
      "explicit batch ord: the wall-clock default would advance the " +
      "high-water mark past every epoch-id-scale ord")
    addPairs(pairs, aCol, bCol, System.currentTimeMillis())
  }

  /** Append one batch of pairs, stamped `ord` (epoch-ms or any monotone
    * batch stamp — the evidence-age axis [[compact]]'s retention prunes
    * on). Each pair lands twice (once headed by each endpoint), so the
    * append is O(2·batch) rows; no closure work happens here. */
  def addPairs(pairs: DataFrame, aCol: String = "doc_a",
               bCol: String = "doc_b", ord: Long): Unit =
      StoreLock.exclusive(new File(path)) {
    hwm.check(ord)
    val p = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    p.unionByName(p.select(col("b").as("a"), col("a").as("b")))
      .withColumn("ord", graft.functions.Params.paramLong(ord))
      .write.mode("append")
      .parquet(new File(appendGen(), "delta").getAbsolutePath)
    hwm.advance(ord)
  }

  /** Delta links contracted onto their snapshot roots: each endpoint maps
    * to its star root (itself when unknown), self-loops drop inside the
    * closure. Each root is its component's MINIMUM id, so the minimum over
    * contracted nodes equals the minimum over the merged components'
    * members — contracted labels are the true labels. */
  private def contracted(s: DataFrame, d: DataFrame): DataFrame = {
    val m = s.select(col("a").as("__n"), col("b").as("__r"))
    d.select(col("a"), col("b"))
      .join(m.select(col("__n").as("a"), col("__r").as("__ra")), Seq("a"), "left")
      .join(m.select(col("__n").as("b"), col("__r").as("__rb")), Seq("b"), "left")
      .select(coalesce(col("__ra"), col("a")).as("ra"),
        coalesce(col("__rb"), col("b")).as("rb"))
  }

  /** Untouched stars pass through; stars whose root was relabeled by the
    * delta closure follow it; delta-closure nodes (touched roots + fresh
    * nodes) appear directly. */
  private def assemble(s: DataFrame, cc: DataFrame): DataFrame = {
    val relabel = cc.select(col("id").as("__r"), col("component").as("__c"))
    s.select(col("a").as("id"), col("b").as("__r"))
      .join(relabel, Seq("__r"), "left")
      .select(col("id"), coalesce(col("__c"), col("__r")).as("component"))
      .unionByName(cc)
      .distinct()
  }

  /** (id, component) over every node linked so far. Incremental: the
    * closure runs only over the delta contracted onto the last compact's
    * stars (rounds and edge-set size track links-since-compact, not
    * history); the stars snapshot is touched by exactly two single-pass
    * joins (root lookup + relabel). Before the first append there is no
    * stored schema, so the empty result types its columns as bigint;
    * callers with non-numeric ids should treat the cold-start frame as
    * shapeless. `maxRounds` bounds the delta closure (exposed so tests can
    * assert the rounds bound really does track the delta). */
  def resolveAll(maxRounds: Int = 50): DataFrame = (stars(), delta()) match {
    case (Some(s), Some(d)) =>
      assemble(s, Components.connected(contracted(s, d), "ra", "rb", maxRounds))
    case (Some(s), None) =>
      s.select(col("a").as("id"), col("b").as("component"))
    case (None, Some(d)) => Components.connected(d, "a", "b", maxRounds)
    case (None, None) =>
      import spark.implicits._
      Seq.empty[(Long, Long)].toDF("id", "component")
  }

  /** Rewrite everything as flat member→root stars (plus root self-rows)
    * under `stars/` in a fresh generation — state back to O(nodes) and
    * resolution unchanged, no matter how many batches appended. The
    * closure input is the INCREMENTAL contraction (delta onto stars), so
    * steady-state compaction cost tracks the delta too. Each row is
    * stamped with its head node's own newest link ord (see the class
    * doc's evidence model). `retainOrdGe` first EXPIRES nodes whose
    * newest evidence predates the horizon: links touching an expired node
    * dissolve, and clusters held together only through it split (the
    * dedup-snapshot retention contract) — that path re-closes the full
    * kept link set, since expiry can split compacted stars. The replaced
    * generation is kept one cycle for lazy readers; older ones are
    * deleted. */
  def compact(retainOrdGe: Option[Long] = None): Unit =
      StoreLock.exclusive(new File(path)) {
    val prev = gens.currentGen()
    allRows().foreach { all =>
      // newest evidence per node: max ord over the rows it heads. Raw
      // links are stored in both directions and stars/self-rows head
      // their member, so the a-side max is exactly the node's own newest
      // evidence — a star's b-side (the root) gains nothing from its
      // members' freshness.
      val nodeOrd = all.groupBy(col("a").as("id")).agg(max("ord").as("__no"))
      def write(cc: DataFrame): Unit = {
        val starRows = cc.join(nodeOrd, "id")
          .select(col("id").as("a"), col("component").as("b"),
            col("__no").as("ord"))
        val next = gens.newGenDir()
        starRows.write.parquet(new File(next, "stars").getAbsolutePath)
        gens.swapPointer(next.getName)
        gens.reapExcept(Set(next.getName) ++ prev.map(_.getName))
      }
      // the eager-consumer shape: the closure's reliable-materialization
      // residue is deleted as soon as the stars generation is written, so
      // the cron loop accumulates nothing under the checkpoint dir
      (retainOrdGe, stars(), delta()) match {
        case (Some(h), _, _) =>
          val fresh = nodeOrd.where(col("__no") >= h)
          val kept = all.where(col("a") =!= col("b"))
            .join(fresh.select(col("id").as("a")), Seq("a"), "left_semi")
            .join(fresh.select(col("id").as("b")), Seq("b"), "left_semi")
          Components.connectedThenClean(kept, "a", "b")(write)
        case (None, Some(s), Some(d)) =>
          Components.connectedThenClean(contracted(s, d), "ra", "rb")(
            cc => write(assemble(s, cc)))
        case (None, Some(s), None) =>
          write(s.select(col("a").as("id"), col("b").as("component")))
        case (None, None, Some(d)) =>
          Components.connectedThenClean(d, "a", "b")(write)
        case (None, None, None) => ()
      }
    }
  }

  /** Count-triggered [[compact]] — the maintenance-loop policy
    * ([[EdgeIndex.compactIfDue]] generalized): fires when the DELTA dir
    * has accumulated `maxBatches` uncompacted append files (`>=` so the
    * advertised read budget is never overshot), forwarding
    * `retainOrdGe` to the compaction it triggers. Due-ness counts the
    * delta side only, NOT [[GenStore.appendDepth]] over the whole
    * generation: `stars/` is the compacted form itself and its file
    * count is the closure write's shuffle width — counting it would
    * re-rewrite a quiet store on every fire once K is at or below that
    * width. A fire on an under-threshold store is a pure directory
    * listing. Returns true when it compacted. */
  def compactIfDue(maxBatches: Int,
                   retainOrdGe: Option[Long] = None): Boolean = {
    val deltaDepth = gens.currentGen().map { g =>
      Option(new File(g, "delta").listFiles()).getOrElse(Array.empty)
        .count(f => f.isFile && f.getName.endsWith(".parquet"))
    }.getOrElse(0)
    val due = deltaDepth >= maxBatches
    if (due) compact(retainOrdGe)
    due
  }
}
