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

/** Persisted, incrementally-maintained duplicate clusters — union-find as a
  * table. Continuous ingest (e.g. [[MinHashIndex.addAndFindPairs]] under the
  * cron loop) emits near-dup pairs batch by batch; this index accumulates
  * them as a link forest and resolves transitive clusters on demand, so the
  * corpus is never re-paired.
  *
  * LSM shape: [[addPairs]] appends O(batch) link rows and does nothing
  * else — the cost of ingesting a batch tracks the batch. [[resolveAll]]
  * pays the (alternating-star) closure over the accumulated links at READ
  * time, and [[compact]] rewrites the links into flat member→root stars in
  * a fresh generation (atomic pointer swap, the [[ParquetKvStore]] /
  * [[MinHashIndex]] pattern), restoring O(nodes) state no matter how many
  * batches appended. Run compact on the same maintenance cadence as the
  * other stores ([[graft.sources.CronTriggerer]]).
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
class ComponentsIndex(spark: SparkSession, path: String) {

  private def pointer = new File(path, "_current")

  private def currentGen(): Option[File] =
    if (!pointer.exists()) None
    else {
      val name = new String(
        java.nio.file.Files.readAllBytes(pointer.toPath), "UTF-8").trim
      Some(new File(path, name)).filter(_.exists())
    }

  private def nextGenIndex(): Int = {
    val existing = Option(new File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("gen-"))
      .map(_.getName.stripPrefix("gen-").toInt)
    // crash orphans (written, never pointed at) count too: a retry must not
    // write into a half-written directory
    if (existing.isEmpty) 0 else existing.max + 1
  }

  private def swapPointer(genName: String): Unit = {
    val tmp = new File(path, "._current.tmp")
    java.nio.file.Files.write(tmp.toPath, genName.getBytes("UTF-8"))
    if (!tmp.renameTo(pointer)) {
      pointer.delete()
      if (!tmp.renameTo(pointer))
        throw new java.io.IOException(s"pointer swap failed at $path")
    }
  }

  private def appendGen(): File = currentGen().getOrElse {
    new File(path).mkdirs()
    val gen = new File(path, s"gen-${nextGenIndex()}")
    gen.mkdirs()
    swapPointer(gen.getName)
    gen
  }

  /** The accumulated links (a, b, ord), if any exist. A zero-row append
    * leaves only a _SUCCESS marker — that still counts as "present" (an
    * empty frame), and a read failure propagates rather than degrading
    * into an empty index. */
  private def links(): Option[DataFrame] =
    currentGen().filter(g =>
      Option(g.listFiles()).getOrElse(Array.empty)
        .exists(f => f.getName.endsWith(".parquet") || f.isDirectory))
      .map(g => spark.read.parquet(g.getAbsolutePath))

  /** Append one batch of pairs as links, stamped `ord` (epoch-ms or any
    * monotone batch stamp — the age axis [[compact]]'s retention prunes
    * on). O(batch) rows; no closure work happens here. */
  def addPairs(pairs: DataFrame, aCol: String = "doc_a",
               bCol: String = "doc_b",
               ord: Long = System.currentTimeMillis()): Unit =
    pairs.select(col(aCol).as("a"), col(bCol).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .withColumn("ord", lit(ord))
      .write.mode("append").parquet(appendGen().getAbsolutePath)

  /** (id, component) over every node linked so far — the transitive
    * closure of ALL accumulated links, paid at read time. */
  def resolveAll(): DataFrame = links() match {
    case Some(e) => Components.connected(e, "a", "b")
    case None =>
      import spark.implicits._
      Seq.empty[(Long, Long)].toDF("id", "component")
  }

  /** Rewrite the accumulated links as flat member→root stars in a fresh
    * generation — state back to O(nodes) and resolution unchanged, no
    * matter how many batches appended. `retainOrdGe` first EXPIRES links
    * whose ord predates the horizon, so clusters held together only by
    * expired evidence dissolve (the dedup-snapshot retention contract);
    * surviving stars are stamped with their cluster's newest surviving ord
    * (per-cluster granularity after compaction). The replaced generation
    * is kept one cycle for lazy readers; older ones are deleted. */
  def compact(retainOrdGe: Option[Long] = None): Unit = {
    val prev = currentGen()
    links().foreach { all =>
      val kept = retainOrdGe.map(h => all.where(col("ord") >= h))
        .getOrElse(all)
      val cc = Components.connected(kept, "a", "b")
      val ords = kept.select(col("a"), col("b"), col("ord"))
      // newest surviving ord per component: resolve each link's a-side
      val linkComp = ords.join(cc.withColumnRenamed("id", "a"), "a")
        .groupBy("component").agg(max("ord").as("ord"))
      val stars = cc.where(col("id") =!= col("component"))
        .select(col("id").as("a"), col("component").as("b"), col("component"))
        .join(linkComp, "component")
        .select(col("a"), col("b"), col("ord"))
      val next = new File(path, s"gen-${nextGenIndex()}")
      stars.write.parquet(next.getAbsolutePath)
      swapPointer(next.getName)
      val keep = Set(next.getName) ++ prev.map(_.getName)
      Option(new File(path).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("gen-") &&
          !keep(f.getName))
        .foreach(Fs.deleteRecursively)
    }
  }
}
