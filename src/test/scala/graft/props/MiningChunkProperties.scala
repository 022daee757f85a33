package graft.props

import graft.SparkSuite
import graft.ops.{KnnOps, RagChunk}
import org.apache.spark.sql.functions._

/** Generated-input differential properties for the round's mining and
  * chunking ops: a plain-Scala reference implementation recomputes every
  * answer on randomized corpora and the Spark result must match it —
  * including tie-breaks, which the fixture specs can only sample.
  *
  * Determinism note: vector components are small integers (stored as
  * exact floats), so dot products and squared norms are EXACT in double
  * regardless of accumulation order, sims computed by the same
  * `dot / (sqrt(na) * sqrt(nb))` formula are bit-identical between the
  * engine and the reference, and exact sim ties (duplicate vectors DO
  * occur under generation) exercise the id tie-breaks identically. */
class MiningChunkProperties extends SparkSuite {
  import spark.implicits._

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    var dp = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dp += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dp / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Random labeled corpus: integer components in [-3, 3], zero vectors
    * dropped (cosine undefined — production callers unit-normalize). */
  private def corpus(seed: Long, n: Int, dim: Int = 6, labels: Int = 4) = {
    val rnd = new scala.util.Random(seed)
    (0 until n)
      .map(i => (i.toLong,
        Seq.fill(dim)((rnd.nextInt(7) - 3).toFloat), rnd.nextInt(labels)))
      .filter(_._2.exists(_ != 0f))
  }

  test("tripletMine equals the reference on random corpora, ties included") {
    for (seed <- Seq(1L, 2L, 3L)) {
      val rows = corpus(seed, 60)
      val df = rows.toDF("vec_id", "embedding", "label")
      val anchors = rows.filter(_._1 % 3 == 0)
      val got = KnnOps.tripletMine(
          df.where($"vec_id" % 3 === 0), df, "vec_id", "embedding", "label",
          margin = 0.1)
        .orderBy("vec_id")
        .select("vec_id", "pos_id", "neg_id", "violated")
        .as[(Long, Long, Long, Boolean)].collect().toSeq
      val want = anchors.flatMap { case (id, v, l) =>
        val others = rows.filter(_._1 != id)
        val pos = others.filter(_._3 == l).map(o => (cos(v, o._2), o._1))
        val neg = others.filter(_._3 != l).map(o => (cos(v, o._2), o._1))
        if (pos.isEmpty || neg.isEmpty) None
        else {
          val p = pos.minBy(x => (x._1, x._2))          // lowest sim, then id
          val n = neg.sortBy(x => (-x._1, x._2)).head   // highest sim, then id
          Some((id, p._2, n._2, n._1 + 0.1 > p._1))
        }
      }.sortBy(_._1)
      assert(got == want, s"seed $seed diverged")
    }
  }

  test("knnClassify equals the reference vote on random corpora") {
    for (seed <- Seq(5L, 6L)) {
      val rows = corpus(seed, 70)
      val df = rows.toDF("vec_id", "embedding", "label")
      val test0 = rows.filter(_._1 % 5 == 0)
      val train = rows.filter(_._1 % 5 != 0)
      val got = KnnOps.knnClassify(
          df.where($"vec_id" % 5 === 0), df.where($"vec_id" % 5 =!= 0),
          "vec_id", "embedding", "label", k = 5)
        .orderBy("vec_id")
        .select("vec_id", "pred_label", "correct")
        .as[(Long, Int, Boolean)].collect().toSeq
      val want = test0.map { case (id, v, l) =>
        val top = train.map(o => (cos(v, o._2), o._1, o._3))
          .sortBy(x => (-x._1, x._2)).take(5)
        // .toSeq BEFORE the map: mapping a Map to (count, label) tuples
        // would re-key by count and silently drop tied labels
        val pred = top.groupBy(_._3).toSeq.map { case (lab, hits) =>
          (hits.size, lab)
        }.sortBy(x => (-x._1, x._2)).head._2
        (id, pred, pred == l)
      }.sortBy(_._1)
      assert(got == want, s"seed $seed diverged")
    }
  }

  test("tripletMineIvf: positives exact, negatives dominated and monotone, full probe = exact") {
    val rows = corpus(31L, 80)
    val df = rows.toDF("vec_id", "embedding", "label")
    val cents = graft.ops.KMeans.fit(df, "vec_id", "embedding", 4, 2)
    val anchors = df.where($"vec_id" % 3 === 0)
    val exact = KnnOps.tripletMine(anchors, df, "vec_id", "embedding",
        "label", margin = 0.1)
      .select($"vec_id", $"pos_id".as("pe"), $"neg_sim".as("nse"),
        $"neg_id".as("ne"))
    var prev: Map[Long, Double] = Map.empty
    for (np <- Seq(1, 2, 4)) {
      val ivf = KnnOps.tripletMineIvf(anchors, df, "vec_id", "embedding",
        "label", cents, nprobe = np, margin = 0.1)
      val j = ivf.join(exact, "vec_id")
        .select($"vec_id", $"pos_id", $"pe", $"neg_sim", $"nse", $"neg_id", $"ne")
        .as[(Long, Long, Long, Double, Double, Long, Long)].collect()
      assert(j.nonEmpty)
      j.foreach { case (id, pi, pe, nsi, nse, ni, ne) =>
        assert(pi == pe, s"nprobe=$np anchor $id: positive must be exact")
        assert(nsi <= nse, s"nprobe=$np anchor $id: subset dominance broken")
        prev.get(id).foreach(p => assert(nsi >= p,
          s"anchor $id: mined negative regressed as nprobe grew"))
        if (np == 4) assert(ni == ne && nsi == nse,
          s"anchor $id: probing every cell must equal the exact miner")
      }
      prev = j.map(x => x._1 -> x._4).toMap
    }
  }

  test("tripletMineIvf posCap: sampled positive dominates, negatives untouched") {
    val rows = corpus(53L, 80)
    val df = rows.toDF("vec_id", "embedding", "label")
    val cents = graft.ops.KMeans.fit(df, "vec_id", "embedding", 4, 2)
    val anchors = df.where($"vec_id" % 3 === 0)
    val un = KnnOps.tripletMineIvf(anchors, df, "vec_id", "embedding",
        "label", cents, nprobe = 2, margin = 0.1)
      .select($"vec_id", $"pos_sim".as("pse"), $"neg_id".as("ne"),
        $"neg_sim".as("nse"))
    // cap = 3 BINDS on every label block here: the mined positive is the
    // hardest within a deterministic sample, so its similarity can only
    // be >= the full block's hardest (a subset's min rises), and the
    // negative side must be bit-identical (the cap is positives-only)
    val capped = KnnOps.tripletMineIvf(anchors, df, "vec_id", "embedding",
      "label", cents, nprobe = 2, margin = 0.1, posCap = 3)
    val j = capped.join(un, "vec_id")
      .select($"vec_id", $"pos_sim", $"pse", $"neg_id", $"ne",
        $"neg_sim", $"nse")
      .as[(Long, Double, Double, Long, Long, Double, Double)].collect()
    assert(j.nonEmpty)
    j.foreach { case (id, psi, pse, ni, ne, nsi, nse) =>
      assert(psi >= pse, s"anchor $id: sampled hardest positive must " +
        s"dominate the complete block's ($psi < $pse)")
      assert(ni == ne && nsi == nse,
        s"anchor $id: the positive cap must not touch the negative side")
    }
    // a cap wider than every block is a no-op: bit-identical output
    val wide = KnnOps.tripletMineIvf(anchors, df, "vec_id", "embedding",
      "label", cents, nprobe = 2, margin = 0.1, posCap = 1000)
      .orderBy("vec_id").collect().toSeq
    assert(wide == KnnOps.tripletMineIvf(anchors, df, "vec_id",
        "embedding", "label", cents, nprobe = 2, margin = 0.1)
      .orderBy("vec_id").collect().toSeq)
  }

  test("knnClassifyIvf probing every cell equals the exact vote") {
    val rows = corpus(41L, 80)
    val df = rows.toDF("vec_id", "embedding", "label")
    val cents = graft.ops.KMeans.fit(df, "vec_id", "embedding", 4, 2)
    val test0 = df.where($"vec_id" % 5 === 0)
    val train = df.where($"vec_id" % 5 =!= 0)
    val exact = KnnOps.knnClassify(test0, train, "vec_id", "embedding",
        "label", k = 5)
      .orderBy("vec_id").collect().toSeq
    val full = KnnOps.knnClassifyIvf(test0, train, "vec_id", "embedding",
        "label", cents, nprobe = 4, k = 5)
      .orderBy("vec_id").collect().toSeq
    assert(full == exact, "complete candidate set must reproduce the exact vote")
  }

  test("centroidClassify is perfect on separable clusters and matches the reference") {
    // clustered generation: label ℓ = 3·axis(ℓ) + noise in [-1, 1] — the
    // class margins dwarf any float wobble, so the reference argmax is
    // unambiguous
    val rnd = new scala.util.Random(11L)
    val dim = 4
    val rows = (0 until 80).map { i =>
      val l = rnd.nextInt(dim)
      val v = Seq.tabulate(dim)(j =>
        ((if (j == l) 3 else 0) + rnd.nextInt(3) - 1).toFloat)
      (i.toLong, v, l)
    }.filter(_._2.exists(_ != 0f))
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = KnnOps.centroidClassify(
      df.where($"vec_id" % 4 === 0), df.where($"vec_id" % 4 =!= 0),
      "vec_id", "embedding", "label", dim)
    assert(out.where(!$"correct").count() == 0,
      "separable clusters must classify perfectly")
  }

  test("RAG chunks equal the reference for arbitrary docs, windows, strides") {
    val rnd = new scala.util.Random(21L)
    val docs = (0 until 40).map { i =>
      val n = 1 + rnd.nextInt(40)
      (i.toLong, (0 until n).map(t => s"w${rnd.nextInt(9)}x$t").mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    for ((w, s) <- Seq((8, 8), (8, 5), (16, 12), (5, 1))) {
      val got = RagChunk.chunks(df, "doc_id", "text", w, s)
        .orderBy("doc_id", "chunk_idx")
        .select("doc_id", "chunk_idx", "start_tok", "n_tok", "chunk_text")
        .as[(Long, Long, Long, Int, String)].collect().toSeq
      val want = docs.flatMap { case (id, text) =>
        val toks = text.split(" ").toSeq
        val n = toks.length
        (0 until n by s)
          .filter(st => st == 0 || n - st > w - s)
          .map { st =>
            val c = toks.slice(st, st + w)
            (id, (st / s).toLong, st.toLong, c.length, c.mkString(" "))
          }
      }.sortBy(x => (x._1, x._2))
      assert(got == want, s"window=$w stride=$s diverged")
      // coverage law: every token of every doc appears in some chunk
      val covered = want.groupBy(_._1).map { case (id, cs) =>
        id -> cs.flatMap(c => c._3 until (c._3 + c._4)).toSet
      }
      docs.foreach { case (id, text) =>
        val n = text.split(" ").length.toLong
        assert(covered(id) == (0L until n).toSet, s"doc $id lost tokens")
      }
    }
  }
}
