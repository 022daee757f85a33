package graft.props

import graft.SparkSuite
import graft.ops.{AviMjpeg, MinHashLsh, ModelGate}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generated-input properties for round 10's new surfaces: the prefix
  * filter's exactness law, the AVI codec's round-trip laws, and the model
  * gate's alignment law — randomized inputs, not one fixture. */
class Round10Properties extends SparkSuite {
  import spark.implicits._

  private val wordGen = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff",
    "gg", "hh", "ii", "jj")
  private def text(seed: Long): String = {
    val g = Gen.chooseNum(0, 20).flatMap(n => Gen.listOfN(n, wordGen))
    g(Gen.Parameters.default, Seed(seed)).get.mkString(" ")
  }

  test("prefix-filtered Jaccard equals all-pairs on generated corpora") {
    // small shared vocabulary ⇒ heavy shingle collisions, short docs,
    // empty docs — the stress case for prefix-filter boundary arithmetic
    for (round <- 0 until 4) {
      val docs = (0 until 60).map(i =>
        (i.toLong, s"b${i % 2}", text(round * 1000L + i)))
        .toDF("doc_id", "source", "text")
      for (t <- Seq(0.1, 0.34, 0.67)) {
        // cutoff 0 forces the prefix path (30-doc blocks would otherwise
        // take the small-block all-pairs shortcut and test nothing)
        val fast = MinHashLsh.jaccardBlocked(docs, "doc_id", "text",
            "source", shingleK = 2, threshold = t, smallBlockCutoff = 0)
          .as[(Long, Long, Double)].collect().toSeq.sorted
        val truth = MinHashLsh.jaccardBlocked(docs, "doc_id", "text",
            "source", shingleK = 2, threshold = 0.0)
          .where($"jaccard" >= t)
          .as[(Long, Long, Double)].collect().toSeq.sorted
        assert(fast == truth, s"round $round threshold $t")
      }
    }
  }

  test("AVI round-trip law: frame count, dims, clock — any shape") {
    val shapes = for {
      n <- Seq(1, 3, 7)
      (w, h) <- Seq((16, 16), (33, 17), (64, 48))
      fps <- Seq(1, 24, 200)
    } yield (n, w, h, fps)
    shapes.foreach { case (n, w, h, fps) =>
      val frames = (0 until n).map { i =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        try {
          g.setColor(new java.awt.Color(20 + 25 * i, 20 + 25 * i,
            20 + 25 * i))
          g.fillRect(0, 0, w, h)
        } finally g.dispose()
        img
      }
      val Some((us, out)) = AviMjpeg.decode(AviMjpeg.encode(frames, fps))
      assert(out.size == n && us == 1000000L / fps,
        s"shape ($n,$w,$h,$fps)")
      assert(out.forall(f => f.getWidth == w && f.getHeight == h))
    }
  }

  test("model gate alignment law: any partitioning × any batch size") {
    val docs = (0 until 97).map(i => (i.toLong, Array(i.toLong, 1L)))
      .toDF("id", "f")
    val w = ModelGate.LinearStub.weights(2)
    for (parts <- Seq(1, 5, 13); bs <- Seq(1, 7, 64)) {
      val out = ModelGate.withScores(docs.repartition(parts), "f", "s",
          ModelGate.LinearStub(2), batchSize = bs)
        .select($"id", $"s").as[(Long, Long)].collect().toMap
      (0 until 97).foreach(i =>
        assert(out(i.toLong) == w(0) * i + w(1), s"p=$parts bs=$bs row $i"))
    }
  }
}
