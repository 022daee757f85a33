package graft.props

import graft.SparkSuite
import graft.ops.{Hits, Normalize, Shards, UrlOps}
import org.apache.spark.sql.functions._

/** Generated-input differential properties for the round's web-curation
  * ops: a plain-Scala reference recomputes every answer on random inputs
  * and the Spark result must match exactly — integer fixed-point HITS,
  * the normalization chain (idempotence + reference model), key-consistent
  * splits, and anchor aggregation under re-partitioning. */
class WebCurationProperties extends SparkSuite {
  import spark.implicits._

  private val S = 1000000L

  /** Sequential integer HITS — the model [[Hits.scores]] must reproduce
    * bit-for-bit. */
  private def modelHits(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, (Long, Long)] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    var hub = nodes.map(_ -> S).toMap
    var auth = Map.empty[Long, Long]
    for (_ <- 1 to iters) {
      val aRaw = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      for ((s, d) <- e) aRaw(d) += hub(s)
      val aTot = aRaw.values.sum
      auth = nodes.map(v =>
        v -> (if (aRaw.contains(v)) aRaw(v) * S / aTot else 0L)).toMap
      val hRaw = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      for ((s, d) <- e) hRaw(s) += auth(d)
      val hTot = hRaw.values.sum
      hub = nodes.map(v =>
        v -> (if (hRaw.contains(v)) hRaw(v) * S / hTot else 0L)).toMap
    }
    nodes.map(v => v -> (hub(v), auth(v))).toMap
  }

  test("HITS equals the sequential integer model on random graphs") {
    for (seed <- Seq(3L, 11L, 29L)) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(70)(
        (rnd.nextInt(10).toLong, rnd.nextInt(13).toLong))
        .filter { case (a, b) => a != b }
      val got = Hits.scores(edges.toDF("src", "dst"), "src", "dst", 3)
        .as[(Long, Long, Long)].collect()
        .map(t => t._1 -> (t._2, t._3)).toMap
      assert(got == modelHits(edges, 3), s"seed=$seed")
    }
  }

  /** Random strings over an alphabet rich in normalization triggers. */
  private def randomMessy(rnd: scala.util.Random, len: Int): String = {
    val pool: Array[String] = Array(
      "a", "B", " ", "  ", "\t", "\n",
      "" + 0xe2.toChar + 0x20ac.toChar + 0x2122.toChar, // ’-mojibake
      "" + 0xe2.toChar + 0x20ac.toChar + 0x9d.toChar,   // ”-mojibake
      "" + 0xc3.toChar + 0xa9.toChar,                   // é-mojibake
      "" + 0x2019.toChar, "" + 0x2026.toChar,           // clean ’ …
      "" + 0xff21.toChar, "" + 0x3000.toChar,           // full-width A, ideo space
      "" + 0x7.toChar, "" + 0x9f.toChar,                // C0/C1 controls
      "" + 0xa0.toChar)                                 // NBSP
    (1 to len).map(_ => pool(rnd.nextInt(pool.length))).mkString
  }

  test("normalize is idempotent on random messy strings") {
    val rnd = new scala.util.Random(17L)
    val inputs = Seq.fill(60)(randomMessy(rnd, rnd.nextInt(30) + 1))
    val once = inputs.toDF("t").select(Normalize.normalize($"t"))
      .as[String].collect().toSeq
    val twice = once.toDF("t").select(Normalize.normalize($"t"))
      .as[String].collect().toSeq
    assert(twice == once)
  }

  test("normalized output contains no mojibake, controls, or width chars") {
    val rnd = new scala.util.Random(23L)
    val inputs = Seq.fill(60)(randomMessy(rnd, rnd.nextInt(40) + 1))
    val out = inputs.toDF("t").select(Normalize.normalize($"t"))
      .as[String].collect()
    out.foreach { s =>
      assert(!s.contains("" + 0xe2.toChar + 0x20ac.toChar),
        s"unrepaired mojibake prefix in ${s.map(_.toInt)}")
      s.foreach { ch =>
        val cp = ch.toInt
        assert(cp >= 0x20 || cp == 0x0A, s"control $cp survived")
        assert(cp < 0xFF01 || cp > 0xFF5E, s"full-width $cp survived")
        assert(cp != 0xA0 && cp != 0x3000, s"exotic space $cp survived")
      }
    }
  }

  test("splitAssignByKey never splits a key across splits, any grouping") {
    val rnd = new scala.util.Random(31L)
    val rows = (1L to 300L).map(i => (i, rnd.nextInt(25).toLong))
    val out = Shards.splitAssignByKey(rows.toDF("id", "k"), "id", "k",
        seed = rnd.nextLong(), Seq(("a", 60), ("b", 30), ("c", 10)))
      .select($"split_key", $"split").as[(Long, String)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).distinct.length)
    out.foreach { case (k, n) => assert(n == 1, s"key $k straddles") }
  }

  test("anchorStats is partition-order independent") {
    val rnd = new scala.util.Random(41L)
    val links = Seq.fill(200)((rnd.nextInt(40).toLong,
      s"https://h${rnd.nextInt(5)}.example.com/p${rnd.nextInt(8)}",
      s"anchor${rnd.nextInt(6)}"))
    val one = UrlOps.anchorStats(
        links.toDF("doc_id", "url", "anchor").repartition(1),
        "doc_id", "url", "anchor")
      .orderBy("canon_url").collect().toSeq
    val many = UrlOps.anchorStats(
        links.toDF("doc_id", "url", "anchor").repartition(7),
        "doc_id", "url", "anchor")
      .orderBy("canon_url").collect().toSeq
    assert(one == many)
  }
}
