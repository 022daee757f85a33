package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[LinearTrainer]] — in-engine batch perceptron: converges on linearly
  * separable planted labels, is invariant to partitioning (integer
  * gradient sums commute), and serves through the [[ModelGate]] session
  * contract exactly. */
class LinearTrainerSpec extends SparkSuite {
  import spark.implicits._

  private val dim = 6
  private val teacher = Array(31L, -17L, 5L, -3L, 11L, -7L)

  // deterministic integer feature vectors with teacher labels: the
  // planted concept is linear in the features, so the data is separable
  private def fixture(n: Int) = {
    val rnd = new scala.util.Random(7)
    (0 until n).map { i =>
      val f = Array.fill(dim)(rnd.nextInt(2001).toLong - 1000L)
      val y = if (f.zip(teacher).map { case (a, b) => a * b }.sum >= 0) 1L
              else 0L
      (i.toLong, f, y)
    }.toDF("id", "f", "y")
  }

  test("training converges on the planted separable concept") {
    val data = fixture(300)
    val w = LinearTrainer.trainPerceptron(data, "f", "y", dim, epochs = 32)
    val scored = ModelGate.withScores(data, "f", "s",
      LinearTrainer.TrainedLinear(w))
    val acc = scored.agg(avg(when(($"s" >= 0L) === ($"y" === 1L), 1.0)
      .otherwise(0.0))).head().getDouble(0)
    assert(acc >= 0.97, s"separable data must be learned, accuracy $acc")
  }

  test("trained weights are partitioning-invariant") {
    val data = fixture(120)
    val w1 = LinearTrainer.trainPerceptron(data.repartition(1), "f", "y",
      dim, epochs = 5)
    val w7 = LinearTrainer.trainPerceptron(data.repartition(7), "f", "y",
      dim, epochs = 5)
    assert(w1.toSeq == w7.toSeq,
      "integer gradient sums must commute across partitionings")
  }

  test("served scores equal the driver-side dot product") {
    val data = fixture(50)
    val w = LinearTrainer.trainPerceptron(data, "f", "y", dim, epochs = 3)
    val got = ModelGate.withScores(data, "f", "s",
        LinearTrainer.TrainedLinear(w))
      .select("id", "f", "s").as[(Long, Array[Long], Long)]
      .collect()
    got.foreach { case (id, f, s) =>
      val want = f.zip(w).map { case (a, b) => a * b }.sum
      assert(s == want, s"doc $id: served $s vs driver $want")
    }
  }

  test("hyperparameter bounds are enforced") {
    val data = fixture(5)
    intercept[IllegalArgumentException] {
      LinearTrainer.trainPerceptron(data, "f", "y", 0, 1)
    }
    intercept[IllegalArgumentException] {
      LinearTrainer.trainPerceptron(data, "f", "y", dim, 0)
    }
    intercept[IllegalArgumentException] { LinearTrainer.TrainedLinear(Array.empty[Long]) }
  }
}
