package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSuite {
  import spark.implicits._

  private def tmp() = java.nio.file.Files
    .createTempDirectory("graft-ivf-idx").toFile.getAbsolutePath

  private val emb = graft.core.Tables
    .embeddings(spark, "/root/testdata/sf0.001")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "neighbor_id", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet

  test("two-batch build searches identically to one-shot IVF") {
    val idx = new IvfIndex(spark, tmp(), "vec_id", "embedding")
    idx.add(emb.where(col("vec_id") % 2 === 0), col("label"))
    idx.add(emb.where(col("vec_id") % 2 === 1), col("label"))
    val queries = emb.where(col("vec_id") < 10)
    val got = rows(idx.search(queries, array(col("label")), k = 3))
    val oneShot = rows(Similarity.ivfTopK(
      queries, emb, "vec_id", "embedding", "label", 3))
    assert(got == oneShot)
  }

  test("replayed appends and compaction never change results") {
    val idx = new IvfIndex(spark, tmp(), "vec_id", "embedding")
    val b = emb.where(col("vec_id") % 3 === 0)
    idx.add(b, col("label"))
    idx.add(b, col("label")) // crash replay
    idx.add(emb.where(col("vec_id") % 3 =!= 0), col("label"))
    val queries = emb.where(col("vec_id") < 10)
    val before = rows(idx.search(queries, array(col("label")), k = 3))
    assert(before == rows(Similarity.ivfTopK(
      queries, emb, "vec_id", "embedding", "label", 3)))
    idx.compact()
    assert(rows(idx.search(queries, array(col("label")), k = 3)) == before)
  }

  test("addIdempotent: a replayed micro-batch re-lands nothing (store-level no-op)") {
    val idx = new IvfIndex(spark, tmp(), "vec_id", "embedding")
    val b0 = emb.where(col("vec_id") % 3 === 0)
    idx.addIdempotent(b0, col("label"))
    val afterFirst = idx.postingsCount()
    assert(afterFirst == b0.count())
    // crash replay of the same batch: ids anti-join away — the STORE is
    // unchanged, not merely the (id-deduped) search view of it
    idx.addIdempotent(b0, col("label"))
    assert(idx.postingsCount() == afterFirst)
    // byte-level: no duplicate posting rows accumulated
    val raw = spark.read.parquet(idx.currentGenerationPath.get)
    assert(raw.count() == afterFirst)
    // later batches still land, and search equals the one-shot answer
    idx.addIdempotent(emb.where(col("vec_id") % 3 =!= 0), col("label"))
    val queries = emb.where(col("vec_id") < 10)
    assert(rows(idx.search(queries, array(col("label")), k = 3)) ==
      rows(Similarity.ivfTopK(queries, emb, "vec_id", "embedding", "label", 3)))
  }

  test("search prunes the postings scan to the probed cells") {
    val path = tmp()
    val idx = new IvfIndex(spark, path, "vec_id", "embedding")
    idx.add(emb, col("label"))
    val queries = emb.where(col("vec_id") === 0)
    val result = idx.search(queries, array(col("label")), k = 3)
    val plan = result.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters:"))
      .getOrElse("")
    assert(pf.contains("cell"), s"probe must prune cell partitions:\n$plan")
  }

  test("null or empty probe arrays fail loudly instead of dropping the query") {
    val idx = new IvfIndex(spark, tmp(), "vec_id", "embedding")
    idx.add(emb, col("label"))
    val queries = emb.where(col("vec_id") < 3)
    val e = intercept[IllegalArgumentException] {
      idx.search(queries, array().cast("array<int>"), k = 3).collect()
    }
    assert(e.getMessage.contains("probe-cell array"))
  }

  test("compact leaves one file per cell") {
    val path = tmp()
    val idx = new IvfIndex(spark, path, "vec_id", "embedding")
    (0 until 4).foreach(i => idx.add(emb.where(col("vec_id") % 4 === i),
      col("label")))
    idx.compact()
    val live = java.nio.file.Files.readString(
      java.nio.file.Paths.get(path, "_current")).trim
    val cellDirs = new java.io.File(path, live).listFiles()
      .filter(_.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty)
    cellDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName}: ${files.length} files")
    }
  }

  test("a restarted index reuses its persisted centroids, never refits") {
    val path = tmp()
    val idx = new IvfIndex(spark, path, "vec_id", "embedding")
    val cents = idx.centroids(emb, k = 4, iters = 3)
    idx.add(emb, KMeans.assignExpr(col("embedding"), cents))
    val queries = emb.where(col("vec_id") < 5)
    val before = rows(idx.search(queries,
      KMeans.probeExpr(col("embedding"), cents, 2), k = 3))

    // "restart": a fresh instance on the same path must load the SAME
    // centroids (training on a subtly different frame must not refit —
    // postings were laid out under the original assignment)
    val reopened = new IvfIndex(spark, path, "vec_id", "embedding")
    val cents2 = reopened.centroids(emb.limit(10), k = 4, iters = 1)
    assert(cents2.map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq)
    assert(rows(reopened.search(queries,
      KMeans.probeExpr(col("embedding"), cents2, 2), k = 3)) == before)
  }

  test("the quantizer refuses to first-train over foreign postings or lie about k") {
    val path = tmp()
    val idx = new IvfIndex(spark, path, "vec_id", "embedding")
    // postings laid out under caller-provided cells: training a quantizer
    // NOW could not match them — must refuse, not silently mis-probe
    idx.add(emb, col("label"))
    val e = intercept[IllegalStateException] {
      idx.centroids(emb, k = 4, iters = 2)
    }
    assert(e.getMessage.contains("no persisted quantizer"))

    // and a persisted artifact must not silently answer a different k —
    // with advice that matches the layout, never "delete it"
    val p2 = tmp()
    val idx2 = new IvfIndex(spark, p2, "vec_id", "embedding")
    idx2.centroids(emb, k = 4, iters = 2)
    val e2 = intercept[IllegalArgumentException] {
      idx2.centroids(emb, k = 8, iters = 2)
    }
    assert(e2.getMessage.contains("rebuild the index to change k"))

    // a too-small training frame fails BEFORE persisting, so a retry with
    // real data trains cleanly instead of hitting a wedged artifact
    val p3 = tmp()
    val idx3 = new IvfIndex(spark, p3, "vec_id", "embedding")
    val e3 = intercept[IllegalArgumentException] {
      idx3.centroids(emb.limit(2), k = 8, iters = 2)
    }
    assert(e3.getMessage.contains("too few"))
    assert(idx3.centroids(emb, k = 8, iters = 2).length == 8)
  }

  test("multi-probe search against trained centroids reaches adjacent cells") {
    val idx = new IvfIndex(spark, tmp(), "vec_id", "embedding")
    val cents = KMeans.fit(emb, "vec_id", "embedding", k = 4, iters = 3)
    idx.add(emb, KMeans.assignExpr(col("embedding"), cents))
    val queries = emb.where(col("vec_id") < 5)
    val p1 = rows(idx.search(queries,
      KMeans.probeExpr(col("embedding"), cents, 1), k = 3))
    val p4 = rows(idx.search(queries,
      KMeans.probeExpr(col("embedding"), cents, 4), k = 3))
    // probing every cell must equal exact brute force
    val exact = rows(Similarity.bruteForceTopK(
      queries, emb, "vec_id", "embedding", 3))
    assert(p4 == exact)
    // widening the probe set can only improve each query's best hit: the
    // nprobe=1 candidate pool is a subset of the nprobe=4 pool
    val best1 = p1.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._3).max }
    val best4 = p4.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._3).max }
    best1.foreach { case (q, s) => assert(s <= best4(q), s"query $q") }
    assert(p1.nonEmpty)
  }
  test("recall-policy compact: drift triggers retrain, recall recovers, " +
    "each generation pairs its quantizer with its own layout") {
    import graft.ops.IvfIndex.RecallPolicy
    val path = tmp()
    val idx = new IvfIndex(spark, path, "vec_id", "embedding")
    def at(theta: Double, psi: Double, r: Double, id: Long) =
      (id, Seq((r * math.cos(theta) * math.cos(psi)).toFloat,
        (r * math.sin(theta) * math.cos(psi)).toFloat,
        (r * math.sin(psi)).toFloat))
    // initial corpus: 16 tight direction-clusters fanned across the
    // equatorial quadrant; the quantizer learns one cell per direction
    val initial = (for (j <- 0 until 16; i <- 0 until 3) yield
      at(j * 0.0873 + i * 0.0005, 0.0, 10.0 + i, j * 100L + i))
      .toDF("vec_id", "embedding")
    val cents = idx.centroids(initial, k = 16, iters = 5)
    idx.add(initial, graft.ops.KMeans.assignExpr(col("embedding"), cents))

    // drift: seven 6-point blobs on elevation rings the quantizer never
    // saw. Each blob sits over a cell boundary and is WIDE in azimuth
    // (offsets to ±0.11 rad vs the 0.0873 cell width), so the old
    // quantizer dices it across FOUR cells — a blob is its own entire
    // top-5 neighborhood (rings and blobs are separated by ≥ 0.3 rad,
    // more than the 0.22 blob diameter), so even two probes see at most
    // half of it and recall sags for every blob query. Post-refit, a blob
    // is a plain 6-point mass: k-means covers it with one (worst case
    // two adjacent) centroids, and two probes see it whole.
    val blobSpec = Seq((0, 0.3), (6, 0.3), (3, 0.6), (9, 0.6), (1, 0.9),
      (7, 0.9), (4, 1.2))
    val drifted = (for (((b, psi), bi) <- blobSpec.zipWithIndex;
                        m <- 0 until 6) yield {
      val sign = if (m % 2 == 0) 1 else -1
      at((b + 0.5) * 0.0873 + sign * (0.02 + 0.045 * (m / 2)), psi, 4.0,
        10000L + bi * 10 + m)
    }).toDF("vec_id", "embedding")
    idx.add(drifted, graft.ops.KMeans.assignExpr(col("embedding"), cents))

    val pol = RecallPolicy(target = 0.85, nprobe = 2, k = 5, sampleN = 64,
      refitIters = 8)
    val first = idx.compact(Some(pol))
    assert(first.exists(s => s.retrained && s.recall < 0.85),
      s"drifted corpus should trip the monitor: $first")
    // recall recovered under the refit quantizer: the next monitored
    // compact measures healthy and does NOT retrain again
    val second = idx.compact(Some(pol))
    assert(second.exists(s => !s.retrained && s.recall >= 0.85),
      s"recall should recover after rebucket: $second")

    // no mixed layout, generation by generation: every retained generation
    // carries its own quantizer, and every stored row's cell is exactly
    // that quantizer's assignment
    val gens = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("gen-")).sortBy(_.getName)
    var audited = 0
    gens.foreach { g =>
      if (new java.io.File(g, "_quantizer/_SUCCESS").exists() &&
          g.listFiles().exists(_.getName.startsWith("cell="))) {
        val q = graft.ops.KMeans.loadCentroids(
          spark, new java.io.File(g, "_quantizer").getAbsolutePath)
        val mismatched = spark.read.parquet(g.getAbsolutePath)
          .where(col("cell") =!=
            graft.ops.KMeans.assignExpr(col("embedding"), q).cast("int"))
          .count()
        assert(mismatched == 0, s"${g.getName} mixes quantizer and layout")
        audited += 1
      }
    }
    assert(audited >= 2, "expected both retained generations audited")
    // and searchOwn (one pointer resolution for quantizer + postings)
    // agrees with the one-shot probed search over the same live quantizer
    val live = idx.centroids(initial, k = 16, iters = 1) // loads, never refits
    val queries = drifted.where(col("vec_id") < 10010)
    val got = rows(idx.searchOwn(queries, nprobe = 2, k = 3))
    val oneShot = rows(Similarity.ivfTopKProbed(queries,
      initial.unionByName(drifted), "vec_id", "embedding", live,
      nprobe = 2, k = 3))
    assert(got == oneShot)
  }

  test("probe budget persists beside the quantizer; compact carries it; " +
    "a retrain drops it") {
    import graft.ops.IvfIndex.RecallPolicy
    val path = tmp()
    val idx = new IvfIndex(spark, path, "vec_id", "embedding")
    val train = (0 until 12).map(i =>
      (i.toLong, Seq(math.cos(i * 0.5).toFloat, math.sin(i * 0.5).toFloat,
        (0.1f * (i % 3)))))
      .toDF("vec_id", "embedding")
    val cents = idx.centroids(train, k = 3, iters = 4)
    idx.add(train, KMeans.assignExpr(col("embedding"), cents))
    assert(idx.probeBudget().isEmpty)

    // price once, persist; a NEW handle over the same path (the fresh-JVM
    // shape) must READ the stored budget, never re-run the tuning loop
    var tunes = 0
    assert(idx.tunedProbeBudget { tunes += 1; (2, 0.81) } == 2)
    assert(tunes == 1)
    val idx2 = new IvfIndex(spark, path, "vec_id", "embedding")
    assert(idx2.tunedProbeBudget { tunes += 1; (99, 0.0) } == 2,
      "a new session must read the persisted budget")
    assert(tunes == 1)
    assert(idx2.probeBudget().contains((2, 0.81)))

    // a layout-preserving compact carries the budget into the new
    // generation (same cells — the pricing still holds)
    idx.compact()
    assert(idx.probeBudget().contains((2, 0.81)),
      "plain compact must carry the budget with the unchanged layout")

    // a retraining compact DROPS it: the new layout invalidates the
    // pricing (target > 1 forces the monitor to retrain)
    val stats = idx.compact(Some(RecallPolicy(target = 1.01, nprobe = 1,
      k = 3, sampleN = 12, refitIters = 4)))
    assert(stats.exists(_.retrained), s"forced retrain should fire: $stats")
    assert(idx.probeBudget().isEmpty,
      "a retrain must invalidate the budget priced for the old layout")
    // and the next tuned call re-prices against the new layout
    assert(idx.tunedProbeBudget { tunes += 1; (3, 0.9) } == 3)
    assert(tunes == 2)
  }

  test("a retrain grows the cell count with the corpus (sqrt-n rule)") {
    import graft.ops.IvfIndex.RecallPolicy
    // the rule itself: grows as ceil(c*sqrt(n)), never shrinks below the
    // live layout, scales by the coefficient, and 0.0 opts out
    assert(IvfIndex.grownCells(8, 1800L) == 43)
    assert(IvfIndex.grownCells(64, 1800L) == 64)
    assert(IvfIndex.grownCells(8, 1800L, cellsPerSqrtN = 0.5) == 22)
    assert(IvfIndex.grownCells(8, 1800L, cellsPerSqrtN = 0.0) == 8)

    // end to end: a store trained at 4 cells on a small snapshot, grown
    // past it by drifted appends — the policy-triggered retrain must
    // size the NEW quantizer from the store (ceil(sqrt(132)) = 12), not
    // keep the stale 4 forever (per-cell lists, hence every probe's
    // candidate volume, would otherwise grow linearly with the corpus)
    val path = tmp()
    val idx = new IvfIndex(spark, path, "vec_id", "embedding")
    def at(theta: Double, psi: Double, r: Double, id: Long) =
      (id, Seq((r * math.cos(theta) * math.cos(psi)).toFloat,
        (r * math.sin(theta) * math.cos(psi)).toFloat,
        (r * math.sin(psi)).toFloat))
    val initial = (for (j <- 0 until 4; i <- 0 until 3) yield
      at(j * 0.35 + i * 0.002, 0.0, 10.0 + i, j * 100L + i))
      .toDF("vec_id", "embedding")
    val cents = idx.centroids(initial, k = 4, iters = 5)
    assert(cents.length == 4)
    idx.add(initial, graft.ops.KMeans.assignExpr(col("embedding"), cents))
    // 120 drifted rows in 20 tight 6-point blobs on elevation rings the
    // 4-cell quantizer never saw — they dice across cells, recall sags
    val drifted = (for (b <- 0 until 20; m <- 0 until 6) yield {
      val sign = if (m % 2 == 0) 1 else -1
      at((b % 4 + 0.5) * 0.35 + sign * (0.02 + 0.05 * (m / 2)),
        0.3 + 0.25 * (b / 4), 4.0, 10000L + b * 10 + m)
    }).toDF("vec_id", "embedding")
    idx.add(drifted, graft.ops.KMeans.assignExpr(col("embedding"), cents))

    val pol = RecallPolicy(target = 0.85, nprobe = 1, k = 5, sampleN = 64,
      refitIters = 8)
    val stats = idx.compact(Some(pol))
    assert(stats.exists(_.retrained),
      s"drifted corpus should trip the monitor: $stats")
    val liveQ = graft.ops.KMeans.loadCentroids(spark, new java.io.File(
      new java.io.File(path, new GenStore(path).currentGen().get.getName),
      "_quantizer").getAbsolutePath)
    assert(liveQ.length == 12,
      s"retrain must size cells by sqrt(132 rows) = 12, got ${liveQ.length}")
    // correctness is untouched by the growth: probing every cell of the
    // grown layout still equals exact brute force
    val all = initial.unionByName(drifted)
    val queries = drifted.where(col("vec_id") < 10010)
    val got = rows(idx.search(queries,
      graft.ops.KMeans.probeExpr(col("embedding"), liveQ, liveQ.length),
      k = 3))
    assert(got == rows(Similarity.bruteForceTopK(
      queries, all, "vec_id", "embedding", 3)))
  }

}
