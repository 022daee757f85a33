package graft

import java.io.File
import java.nio.file.Files
import java.sql.Timestamp
import java.time.LocalDateTime

import graft.ops.{BucketedKvStore, ComponentsIndex, IvfIndex, KvStore, MinHashIndex}
import graft.sources.CronTriggerer
import graft.streaming.{DelayedBuckets, DelayedRoute}
import org.apache.spark.sql.functions._

/** The "pipeline that runs forever" story in one loop: a single cron driver
  * fires the three maintenance passes that bound disk and deliver parked
  * work — [[BucketedKvStore.reapAll]] (cold-bucket TTL expiry + tombstone
  * GC), [[DelayedBuckets.reingestDue]] (parked far-future rows re-enter
  * ingest), and the generation compactions of every persisted index
  * ([[MinHashIndex]] postings, [[ComponentsIndex]] links, [[IvfIndex]]
  * cells, [[graft.ops.Bm25Index]] term postings,
  * [[graft.ops.ExactDedupIndex]] fingerprints,
  * [[graft.ops.ParagraphIndex]] keepers, [[graft.ops.IvfPqIndex]] code
  * cells — file counts back to O(1)) — under virtual time, the deployment
  * shape every one of these components documents. */
class MaintenanceLoopSpec extends SparkSuite {
  import spark.implicits._

  test("compaction triggers on batch COUNT, not cron cadence") {
    // the policy from the measured curve (BATCH_COUNT_R13.json): edge
    // reads degrade ~0.10 s per uncompacted batch, so a 0.5 s
    // read-latency budget prices K = 5 batches — the loop compacts when
    // the count exceeds K, never merely because a fire happened
    val dir = Files.createTempDirectory("loop-policy").toFile.getAbsolutePath
    val edges = new graft.ops.EdgeIndex(spark, dir)
    val k = graft.ops.CompactionPolicy.maxBatches(readBudgetS = 0.5)
    assert(k == 5)
    // exact-multiple budgets must not price K one batch low through FP
    // truncation (0.3/0.1 is 2.999... in doubles)
    assert(graft.ops.CompactionPolicy.maxBatches(readBudgetS = 0.3) == 3)
    assert(graft.ops.CompactionPolicy.maxBatches(readBudgetS = 1.2) == 12)

    def addBatches(r: Range): Unit = r.foreach(i =>
      edges.addEdges(Seq((i.toLong, i + 100L)).toDF("src", "dst"), i.toLong))
    def fires(n: Int): Seq[Boolean] = {
      val start = LocalDateTime.of(2024, 1, 1, 0, 0)
      var clock = start
      val out = Seq.newBuilder[Boolean]
      CronTriggerer.runLoop(CronTriggerer.parse("* * * * *"),
        runPass = _ => out += edges.compactIfDue(k),
        now = () => clock, sleepUntil = at => clock = at, maxFires = n)
      out.result()
    }

    // 3 batches — under the threshold: repeated fires must NOT rewrite
    // the store (cadence alone never triggers)
    addBatches(1 to 3)
    assert(fires(3) == Seq(false, false, false))
    assert(edges.uncompactedBatches == 3,
      "a quiet store under budget must not be rewritten by the cron")

    // 2 more — exactly AT the threshold: K batches already cost the
    // full budget, so the next fire compacts (>=, not > — waiting for
    // K+1 would overshoot the advertised budget by one per-batch cost),
    // restoring the read floor; the following fire is a no-op again
    addBatches(4 to 5)
    assert(edges.uncompactedBatches == 5)
    assert(fires(2) == Seq(true, false))
    assert(edges.uncompactedBatches == 1)
    assert(edges.edges().count() == 5, "compaction must lose no edges")
  }

  test("one cron loop reaps stores, re-ingests due buckets, and compacts the index") {
    // KV store with TTL + tombstone horizon: a live key, an expiring key,
    // and a deleted key — only maintenance passes may touch them afterwards
    val kvDir = Files.createTempDirectory("loop-kv").toFile.getAbsolutePath
    val store = new BucketedKvStore(spark, kvDir, Seq("k"), col("ver"), "v",
      expireAtCol = Some("expire_at"), numBuckets = 4,
      tombstoneRetainMs = Some(0L))
    val now = System.currentTimeMillis()
    def batch(rows: Seq[(String, Long, String, java.lang.Long)]) =
      rows.toDF("k", "ver", "v", "expire_at")
        .select(col("k"), col("ver").cast("long"), col("v"),
          col("expire_at").cast("long"))
    KvStore.upsertBatch(batch(Seq(
      ("live", 1L, "x", null),
      ("cold", 1L, "y", java.lang.Long.valueOf(now + 800L)))),
      Seq("k"), col("ver"), store)
    KvStore.upsertBatch(batch(Seq(("dead", 2L, null, null))),
      Seq("k"), col("ver"), store)

    // a parked delayed bucket: deliverAt 70s lands in bucket 1 (60s buckets)
    val parkRoot = Files.createTempDirectory("loop-park").toFile.getAbsolutePath
    val ingest = Files.createTempDirectory("loop-in").toFile.getAbsolutePath + "/topic"
    DelayedBuckets.park(Seq(DelayedRoute("pk", "pv", 1L,
      new Timestamp(70000L), "defer", 70000L / 60000L)).toDS(), parkRoot)

    // an LSH index with per-batch append files awaiting compaction
    val idxDir = Files.createTempDirectory("loop-idx").toFile.getAbsolutePath
    val idx = new MinHashIndex(spark, idxDir, "doc_id", "text")
    val boiler = "alpha beta gamma delta epsilon zeta eta theta"
    idx.addAndFindPairs(Seq((1L, s"$boiler variant1")).toDF("doc_id", "text"))
    idx.addAndFindPairs(Seq((2L, s"$boiler variant2")).toDF("doc_id", "text"))

    // a cluster index with links accumulated across batches
    val ccDir = Files.createTempDirectory("loop-cc").toFile.getAbsolutePath
    val cc = new ComponentsIndex(spark, ccDir)
    cc.addPairs(Seq((1L, 2L)).toDF("doc_a", "doc_b"), ord = 1)
    cc.addPairs(Seq((2L, 3L)).toDF("doc_a", "doc_b"), ord = 2)
    val ccBefore = cc.resolveAll().as[(Long, Long)].collect().toMap

    // an IVF index with per-batch cell files awaiting compaction
    val ivfDir = Files.createTempDirectory("loop-ivf").toFile.getAbsolutePath
    val ivf = new IvfIndex(spark, ivfDir, "vec_id", "embedding")
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    ivf.add(emb.where(col("vec_id") % 2 === 0), col("label"))
    ivf.add(emb.where(col("vec_id") % 2 === 1), col("label"))

    // an IVF-PQ code store with per-batch cell files awaiting compaction
    val ipqDir = Files.createTempDirectory("loop-ivfpq").toFile.getAbsolutePath
    val ipqCents = graft.ops.KMeans.fit(emb, "vec_id", "embedding", 4, 2)
    val ipqModel = graft.ops.Pq.train(emb, "vec_id", "embedding",
      m = 4, k = 8, iters = 2)
    val ipq = new graft.ops.IvfPqIndex(spark, ipqDir, "vec_id", "embedding",
      ipqModel, ipqCents)
    ipq.add(emb.where(col("vec_id") % 2 === 0))
    ipq.add(emb.where(col("vec_id") % 2 === 1))
    val ipqQs = emb.where(col("vec_id") < 5)
    val ipqBefore = ipq.search(ipqQs, emb, nprobe = 2, k = 3, shortlist = 12)
      .collect().toSet

    // a simhash posting index with per-batch partition files
    val shDir = Files.createTempDirectory("loop-simhash").toFile.getAbsolutePath
    val shIdx = new graft.ops.SimHashIndex(spark, shDir, "doc_id")
    shIdx.addAndDedup(Seq((1L, "the quick brown fox jumps high"))
      .toDF("doc_id", "text"), "text", ord = 1L)
    shIdx.addAndDedup(Seq((2L, "unrelated maintenance loop content"))
      .toDF("doc_id", "text"), "text", ord = 2L)

    // an exact-dedup fingerprint index with per-batch partition files
    val exDir = Files.createTempDirectory("loop-exact").toFile.getAbsolutePath
    val ex = new graft.ops.ExactDedupIndex(spark, exDir, "doc_id", "text")
    ex.addAndDedup(Seq((1L, "same text"), (2L, "other")).toDF("doc_id", "text"),
      ord = 1L)
    ex.addAndDedup(Seq((3L, "same text"), (4L, "third")).toDF("doc_id", "text"),
      ord = 2L)
    val exBefore = ex.keepers().as[(String, Long)].collect().toSet

    // a paragraph-dedup keeper index with per-batch partition files
    val paDir = Files.createTempDirectory("loop-para").toFile.getAbsolutePath
    val pa = new graft.ops.ParagraphIndex(spark, paDir, "doc_id", "text")
    pa.addAndExcise(Seq((1L, "shared unit\n\nown one")).toDF("doc_id", "text"),
      ord = 1L)
    pa.addAndExcise(Seq((2L, "shared unit\n\nown two")).toDF("doc_id", "text"),
      ord = 2L)
    val paBefore = pa.keepers().as[(String, Long, Long)].collect().toSet

    // a BM25 postings index with per-batch term-partition files
    val bmDir = Files.createTempDirectory("loop-bm25").toFile.getAbsolutePath
    val bmDocs = Seq((1L, "spark join fast"), (2L, "spark scan slow"),
      (3L, "join scan merge")).toDF("doc_id", "text")
    val bm = new graft.ops.Bm25Index(spark, bmDir, "doc_id", "text")
    bm.add(bmDocs.where(col("doc_id") <= 2), ord = 1L)
    bm.add(bmDocs.where(col("doc_id") === 3), ord = 2L)
    val bmQs = Seq("q" -> "spark join")
    val bmBefore = bm.search(bmQs, 3).collect().toSet

    // an artifact store holding one live snapshot, one superseded snapshot
    // (regenerated corpus), and a crashed build's tmp orphan — the loop's
    // reap must keep only the live fingerprint
    val artBase = Files.createTempDirectory("loop-art").toFile
    val prevArtProp = sys.props.get("graft.artifacts.dir")
    sys.props("graft.artifacts.dir") = artBase.getAbsolutePath
    val artCorpus = Files.createTempDirectory("loop-art-corpus").toFile
    val artFile = new File(artCorpus, "t.parquet")
    Files.writeString(artFile.toPath, "v1")
    graft.queries.Artifacts.materialized(spark, artCorpus.getAbsolutePath,
      "loop-kind")(Seq(1L).toDF("id"))
    Files.writeString(artFile.toPath, "v2-regenerated")
    artFile.setLastModified(artFile.lastModified() + 10000)
    graft.queries.Artifacts.materialized(spark, artCorpus.getAbsolutePath,
      "loop-kind")(Seq(2L).toDF("id"))
    new File(new File(artBase, "loop-kind"), ".tmp-crashed").mkdirs()

    Thread.sleep(1500) // "cold" expires; "dead"'s tombstone horizon passes

    // ONE driver loop under virtual time: fire at minute m ⇒ nowMs = m·60s
    val start = LocalDateTime.of(2024, 1, 1, 0, 0)
    var clock = start
    val delivered = Seq.newBuilder[Seq[Long]]
    try {
      val n = CronTriggerer.runLoop(CronTriggerer.parse("* * * * *"),
        runPass = at => {
          val virtualMs = java.time.Duration.between(start, at).toMillis
          store.reapAll()
          delivered += DelayedBuckets.reingestDue(spark, parkRoot, ingest,
            nowMs = virtualMs, bucketMs = 60000L, horizonMs = 60000L)
          idx.compact()
          cc.compact()
          bm.compact()
          ex.compact()
          pa.compact()
          shIdx.compact()
          // the production loop runs the MONITORED compact: recall is
          // measured every cycle against the base table; a healthy store
          // (codebooks trained on this corpus) must never trip the retrain,
          // or the bit-identity assertion below would catch the re-encode
          assert(!ipq.compact(Some((emb,
            graft.ops.IvfPqIndex.RecallPolicy(target = 0.05))))
            .exists(_.retrained))
          graft.queries.Artifacts.reapExcept(Seq(artCorpus.getAbsolutePath))
          // the production loop runs the monitored compact; this index has
          // caller-provided cells and no owned quantizer, so the monitor
          // must degrade to a plain compact (None), never measure against a
          // quantizer the layout was not built under
          assert(ivf.compact(
            Some(graft.ops.IvfIndex.RecallPolicy(target = 0.9))).isEmpty)
        },
        now = () => clock,
        sleepUntil = at => clock = at,
        maxFires = 3)
      assert(n == 3)

      // artifact store bounded: only the live snapshot's artifact survives,
      // and it still reads (repeated reaps were no-ops)
      assert(new File(artBase, "loop-kind").listFiles().map(_.getName).toSet
        == Set(graft.queries.Artifacts.corpusFingerprint(
          artCorpus.getAbsolutePath)))
      assert(graft.queries.Artifacts.materialized(spark,
        artCorpus.getAbsolutePath, "loop-kind")(sys.error("must not rebuild"))
        .as[Long].collect().toSeq == Seq(2L))
    } finally prevArtProp match {
      case Some(p) => sys.props("graft.artifacts.dir") = p
      case None => sys.props -= "graft.artifacts.dir"
    }

    // the parked row re-ingested EXACTLY once (fire 1: bucket window ends
    // 120s ≤ 60s now + 60s horizon), later fires are clean no-ops
    assert(delivered.result() == Seq(Seq(1L), Seq.empty, Seq.empty))
    assert(spark.read.format("graft-topic").option("path", ingest).load()
      .select("key").as[String].collect().toSeq == Seq("pk"))

    // cold-bucket disk is bounded: the expired entry AND the horizon-passed
    // tombstone left the stored generations although no batch arrived
    def storedKeys() = new File(kvDir).listFiles()
      .filter(_.getName.startsWith("bucket-"))
      .flatMap(b => b.listFiles().filter(_.getName.startsWith("gen-"))
        .sortBy(_.getName).lastOption)
      .map(g => spark.read.parquet(g.getAbsolutePath))
      .reduce(_ unionByName _).select("k").as[String].collect().toSet
    assert(storedKeys() == Set("live"),
      "reapAll under the loop must retire expired entries and old tombstones")
    assert(store.read().select("k").as[String].collect().toSeq == Seq("live"))

    // postings compacted to one file per partition — measured BEFORE the
    // next append — and probes against the compacted index still pair
    val gen = new File(idx.currentGenerationPath.get)
    val fileCounts = for {
      band <- gen.listFiles().toSeq if band.getName.startsWith("band=")
      bp <- band.listFiles().toSeq if bp.getName.startsWith("bp=")
    } yield bp.listFiles().count(_.getName.endsWith(".parquet"))
    assert(fileCounts.nonEmpty && fileCounts.forall(_ == 1),
      s"compaction under the loop left $fileCounts files per partition")
    val pairs = idx.addAndFindPairs(
      Seq((9L, s"$boiler variant1")).toDF("doc_id", "text"))
      .select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 9L)) && pairs.forall(_._2 == 9L),
      s"compacted index lost cross-batch pairs: $pairs")

    // simhash postings compacted to one file per block partition; a probe
    // against the compacted store still flags a near-dup of batch 1
    val shGen = new File(shIdx.currentGenerationPath.get)
    shGen.listFiles().filter(_.getName.startsWith("pb=")).foreach { d =>
      assert(d.listFiles().count(_.getName.endsWith(".parquet")) == 1,
        s"simhash compaction left multiple files in ${d.getName}")
    }
    val shProbe = shIdx.addAndDedup(
      Seq((9L, "the quick brown fox jumps high")).toDF("doc_id", "text"),
      "text", ord = 3L)
    assert(shProbe.select("is_dup").as[Boolean].head(),
      "compacted simhash index lost its postings")

    // cluster index: resolution unchanged through repeated compaction, and
    // the live generation is flat stars (one row per node)
    assert(cc.resolveAll().as[(Long, Long)].collect().toMap == ccBefore)
    val ccGen = new File(ccDir, Files.readString(
      new File(ccDir, "_current").toPath).trim)
    assert(spark.read.parquet(new File(ccGen, "stars").getAbsolutePath)
      .count() == ccBefore.size)

    // IVF cells: one file per cell, search still matches one-shot
    val ivfGen = new File(ivfDir, Files.readString(
      new File(ivfDir, "_current").toPath).trim)
    val cellDirs = ivfGen.listFiles().filter(_.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty, "compacted IVF generation lost its cells")
    cellDirs.foreach { d =>
      assert(d.listFiles().count(_.getName.endsWith(".parquet")) == 1,
        s"${d.getName} not compacted under the loop")
    }
    val queries = emb.where(col("vec_id") < 5)
    assert(ivf.search(queries, array(col("label")), k = 3).count() ==
      graft.ops.Similarity.ivfTopK(queries, emb, "vec_id", "embedding",
        "label", 3).count())

    // IVF-PQ code store: one file per cell, search answers unchanged
    val ipqGen = new File(ipqDir, Files.readString(
      new File(ipqDir, "_current").toPath).trim)
    val ipqCells = ipqGen.listFiles().filter(_.getName.startsWith("cell="))
    assert(ipqCells.nonEmpty, "compacted IVF-PQ generation lost its cells")
    ipqCells.foreach { d =>
      assert(d.listFiles().count(_.getName.endsWith(".parquet")) == 1,
        s"${d.getName} not compacted under the loop")
    }
    assert(ipq.search(ipqQs, emb, nprobe = 2, k = 3, shortlist = 12)
      .collect().toSet == ipqBefore,
      "compaction under the loop changed IVF-PQ answers")

    // BM25 postings: one file per term partition, searches unchanged
    val bmGen = new File(bmDir, Files.readString(
      new File(bmDir, "_current").toPath).trim)
    val bmParts = new File(bmGen, "postings").listFiles()
      .filter(_.getName.startsWith("tp="))
    assert(bmParts.nonEmpty && bmParts.forall(
      _.listFiles().count(_.getName.endsWith(".parquet")) == 1),
      "BM25 postings not compacted under the loop")
    assert(bm.search(bmQs, 3).collect().toSet == bmBefore,
      "compaction under the loop changed BM25 scores")

    // paragraph index: keepers unchanged, one file per partition, and a
    // later batch still excises known boilerplate against the compacted
    // store
    assert(pa.keepers().as[(String, Long, Long)].collect().toSet == paBefore,
      "compaction under the loop changed paragraph keepers")
    val paGen = new File(pa.currentGenerationPath.get)
    val paParts = paGen.listFiles().filter(_.getName.startsWith("php="))
    assert(paParts.nonEmpty && paParts.forall(
      _.listFiles().count(_.getName.endsWith(".parquet")) == 1),
      "paragraph keepers not compacted under the loop")
    assert(pa.addAndExcise(
        Seq((9L, "shared unit\n\nown nine")).toDF("doc_id", "text"), ord = 9L)
      .select("text").as[String].collect().toSeq == Seq("own nine"))

    // exact-dedup fingerprints: keepers unchanged, one file per partition
    assert(ex.keepers().as[(String, Long)].collect().toSet == exBefore,
      "compaction under the loop changed exact-dedup keepers")
    assert(exBefore.map(_._2) == Set(1L, 2L, 4L)) // 3 deduped against 1
    val exGen = new File(ex.currentGenerationPath.get)
    val exParts = exGen.listFiles().filter(_.getName.startsWith("fpp="))
    assert(exParts.nonEmpty && exParts.forall(
      _.listFiles().count(_.getName.endsWith(".parquet")) == 1),
      "exact-dedup postings not compacted under the loop")
  }

  test("count-triggered compaction generalizes to every persisted store") {
    // the r15 policy lived on EdgeIndex alone; every other store
    // compacted on cadence, letting file counts grow unboundedly between
    // cron fires. compactIfDue now rides GenStore.appendDepth (files in
    // the widest partition — what a pruned probe actually lists), with K
    // priced from the probe family's measured ~0.002 s/append curve
    // (BATCH_COUNT_R13.json) instead of the edge store's 0.10.
    val base = Files.createTempDirectory("loop-count").toFile.getAbsolutePath

    // deterministic depth leg, driven under the cron loop: IVF cells are
    // caller-assigned, so every add lands one file in cell 0 and
    // appendDepth counts adds exactly
    val ivf = new IvfIndex(spark, s"$base/ivf", "vec_id", "embedding")
    val k = graft.ops.CompactionPolicy.maxBatches(readBudgetS = 0.006,
      graft.ops.CompactionPolicy.ProbeStorePerBatchReadCostS)
    assert(k == 3)
    def addVec(i: Int): Unit = ivf.add(
      Seq((i.toLong, Seq.fill(4)(i.toFloat))).toDF("vec_id", "embedding"),
      lit(0))
    (1 to 2).foreach(addVec)
    val start = LocalDateTime.of(2024, 1, 1, 0, 0)
    var clock = start
    val fired = Seq.newBuilder[Boolean]
    CronTriggerer.runLoop(CronTriggerer.parse("* * * * *"),
      runPass = _ => fired += ivf.compactIfDue(k),
      now = () => clock, sleepUntil = at => clock = at, maxFires = 2)
    assert(fired.result() == Seq(false, false),
      "2 appends under K=3 must not be rewritten by cadence alone")
    addVec(3)
    val fired2 = Seq.newBuilder[Boolean]
    CronTriggerer.runLoop(CronTriggerer.parse("* * * * *"),
      runPass = _ => fired2 += ivf.compactIfDue(k),
      now = () => clock, sleepUntil = at => clock = at, maxFires = 2)
    assert(fired2.result() == Seq(true, false),
      "the 3rd append reaches K and the NEXT fire must compact, once")
    val hits = ivf.search(
      Seq((0L, Seq(2f, 2f, 2f, 2f))).toDF("vec_id", "embedding"),
      array(lit(0)), k = 3)
    assert(hits.select("neighbor_id").as[Long].collect().toSet
      == Set(1L, 2L, 3L), "compaction must lose no postings")

    // face leg for the rest of the family: under-threshold fires are
    // listings (generation unchanged), a due fire compacts to one file
    // per partition leaf and preserves the read face
    import org.apache.spark.sql.DataFrame
    val docs1 = Seq((1L, "alpha beta gamma delta"), (2L, "epsilon zeta"))
      .toDF("id", "text")
    val docs2 = Seq((3L, "alpha beta gamma delta"), (4L, "eta theta iota"))
      .toDF("id", "text")

    val ex2 = new graft.ops.ExactDedupIndex(spark, s"$base/exact", "id", "text")
    ex2.addAndDedup(docs1, 1L).count()
    ex2.addAndDedup(docs2, 2L).count()
    val exKeep = ex2.keepers().as[(String, Long)].collect().toSet
    val exGenBefore = ex2.currentGenerationPath.get
    assert(!ex2.compactIfDue(1000) &&
      ex2.currentGenerationPath.get == exGenBefore,
      "an under-threshold fire must not rewrite the store")
    assert(ex2.compactIfDue(1))
    assert(ex2.keepers().as[(String, Long)].collect().toSet == exKeep,
      "count-triggered compaction changed exact-dedup keepers")
    // the compacted form is one file per partition leaf, so the floor
    // depth is 1 and any production K (>= 2) leaves a quiet store alone
    assert(!ex2.compactIfDue(2),
      "a just-compacted store must not be rewritten again")

    val bm = new graft.ops.Bm25Index(spark, s"$base/bm25", "id", "text")
    bm.add(docs1, 1L); bm.add(docs2, 2L)
    val q = Seq(("q1", "alpha beta"))
    val bmBefore = bm.search(q, 2).select("id").as[Long].collect().toSet
    assert(!bm.compactIfDue(1000))
    assert(bm.compactIfDue(1))
    assert(bm.search(q, 2).select("id").as[Long].collect().toSet == bmBefore,
      "count-triggered compaction changed BM25 results")

    val mh = new MinHashIndex(spark, s"$base/lsh", "id", "text")
    mh.addAndFindPairs(docs1, 1L).count()
    mh.addAndFindPairs(docs2, 2L).count()
    assert(!mh.compactIfDue(1000))
    assert(mh.compactIfDue(1))
    // the store still matches a known near-dup after the rewrite
    assert(mh.addAndFindPairs(
        Seq((9L, "alpha beta gamma delta")).toDF("id", "text"), 3L)
      .count() >= 1, "count-triggered compaction lost LSH postings")

    val co = new ComponentsIndex(spark, s"$base/cc")
    co.addPairs(Seq((1L, 2L)).toDF("doc_a", "doc_b"), ord = 1L)
    co.addPairs(Seq((2L, 3L)).toDF("doc_a", "doc_b"), ord = 2L)
    assert(!co.compactIfDue(1000))
    assert(co.compactIfDue(1))
    assert(co.resolveAll().where(col("component") === 1L).count() == 3,
      "count-triggered compaction split the merged component")
    // due-ness counts the DELTA side only: the compacted stars/ dir is
    // as wide as the closure's shuffle, and counting it would rewrite
    // this quiet store on every fire even at K = 1
    assert(!co.compactIfDue(1),
      "a compacted components store (empty delta) must read as not due")

    val sh = new graft.ops.SimHashIndex(spark, s"$base/simhash", "id")
    sh.addAndDedup(docs1, "text", 1L).count()
    sh.addAndDedup(docs2, "text", 2L).count()
    assert(!sh.compactIfDue(1000))
    assert(sh.compactIfDue(1))
    assert(sh.addAndDedup(
        Seq((9L, "alpha beta gamma delta")).toDF("id", "text"), "text", 3L)
      .where(col("is_dup")).count() == 1,
      "count-triggered compaction lost SimHash fingerprints")

    val pa2 = new graft.ops.ParagraphIndex(spark, s"$base/para", "id", "text")
    pa2.addAndExcise(Seq((1L, "shared unit\n\nown one")).toDF("id", "text"),
      1L).count()
    pa2.addAndExcise(Seq((2L, "shared unit\n\nown two")).toDF("id", "text"),
      2L).count()
    val paKeep = pa2.keepers().collect().toSet
    assert(!pa2.compactIfDue(1000))
    assert(pa2.compactIfDue(1))
    assert(pa2.keepers().collect().toSet == paKeep,
      "count-triggered compaction changed paragraph keepers")

    val vecs = Seq((1L, Seq(1f, 0f, 0f, 0f)), (2L, Seq(0f, 1f, 0f, 0f)),
      (3L, Seq(1f, 1f, 0f, 0f)), (4L, Seq(0f, 0f, 1f, 1f)))
      .toDF("vec_id", "embedding")
    val pqModel = graft.ops.Pq.train(vecs, "vec_id", "embedding",
      m = 2, k = 2, iters = 1)
    val cents = graft.ops.KMeans.fit(vecs, "vec_id", "embedding", 2, 1)
    val ipq = new graft.ops.IvfPqIndex(spark, s"$base/ivfpq", "vec_id",
      "embedding", pqModel, cents)
    ipq.add(vecs.where(col("vec_id") <= 2))
    ipq.add(vecs.where(col("vec_id") > 2))
    def ipqTop: Set[(Long, Long)] = ipq.search(
        vecs.where(col("vec_id") === 1L), vecs, nprobe = 2, k = 2,
        shortlist = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ipqBefore = ipqTop
    assert(!ipq.compactIfDue(1000))
    assert(ipq.compactIfDue(1))
    assert(ipqTop == ipqBefore,
      "count-triggered compaction changed IVF-PQ results")
  }
}
