package graft.ops

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[ModelGate]] — the pluggable broadcast-model batch scorer contract. */
class ModelGateSpec extends SparkSuite {
  import spark.implicits._

  private def docs(n: Int, parts: Int) =
    (0 until n).map(i => (i.toLong, Array(i.toLong, 2L * i, 1L)))
      .toDF("id", "f").repartition(parts)

  test("scores are exact, aligned, and order-preserving across batches") {
    // batchSize 7 over 100 rows in 4 partitions: many ragged batches —
    // any misalignment between rows and returned scores shows up
    val out = ModelGate.withScores(docs(100, 4), "f", "s",
        ModelGate.LinearStub(3), batchSize = 7)
      .select($"id", $"s").as[(Long, Long)].collect().toMap
    val w = ModelGate.LinearStub.weights(3)
    (0 until 100).foreach { i =>
      val want = w(0) * i + w(1) * 2 * i + w(2)
      assert(out(i.toLong) == want, s"row $i")
    }
  }

  test("one session per non-empty partition; batches sized to batchSize") {
    ModelGateSpec.opens.set(0)
    ModelGateSpec.batchSizes.clear()
    // 10 partitions over 50 rows with batchSize 8: sessions == non-empty
    // partitions (not rows, not batches), every batch ≤ 8
    val df = docs(50, 10)
    val nonEmpty = df.rdd.mapPartitions(it => Iterator(if (it.hasNext) 1 else 0))
      .sum().toInt
    val n = ModelGate.withScores(df, "f", "s",
      new ModelGateSpec.CountingModel, batchSize = 8).count()
    assert(n == 50)
    assert(ModelGateSpec.opens.get() == nonEmpty,
      s"opens=${ModelGateSpec.opens.get()} nonEmpty=$nonEmpty — the session " +
        "must be built once per partition, where a real model pays its " +
        "runtime construction")
    val sizes = ModelGateSpec.batchSizes.toArray(Array.empty[Integer]).map(_.toInt)
    assert(sizes.sum == 50 && sizes.forall(_ <= 8),
      s"batch shape violated: ${sizes.mkString(",")}")
  }

  test("null feature rows bypass the session and fail the cascade closed") {
    val df = Seq((1L, Array(5L, 0L, 0L)), (2L, null.asInstanceOf[Array[Long]]))
      .toDF("id", "f")
    val scored = ModelGate.withScores(df, "f", "s", ModelGate.LinearStub(3))
    val rows = scored.orderBy("id").select($"s").collect()
    assert(!rows(0).isNullAt(0) && rows(1).isNullAt(0))
    val verdicts = FilterCascade.decide(scored, "id",
        Seq("model" -> ($"s" >= Long.MinValue)))
      .orderBy("id").select($"keep").as[Boolean].collect().toSeq
    assert(verdicts == Seq(true, false),
      "an unscorable document must not silently pass the gate")
  }

  test("a null ELEMENT inside a feature vector fails closed, not as NPE") {
    // array<bigint> is nullable-element by default; a partially-null
    // vector must take the null-score path like a null vector — the old
    // getSeq[Long] read NPE'd in the executor instead
    val df = Seq((1L, Seq[java.lang.Long](5L, null, 2L)),
        (2L, Seq[java.lang.Long](1L, 2L, 3L)))
      .toDF("id", "f")
    val rows = ModelGate.withScores(df, "f", "s", ModelGate.LinearStub(3))
      .orderBy("id").select($"s").collect()
    assert(rows(0).isNullAt(0), "null-element vector scores null")
    assert(!rows(1).isNullAt(0), "the clean vector still scores")
  }

  test("a model that drops or pads rows fails loudly") {
    val ex = intercept[org.apache.spark.SparkException] {
      ModelGate.withScores(docs(10, 1), "f", "s",
        new ModelGateSpec.BrokenModel).count()
    }
    assert(ex.getMessage.contains("scores") ||
      ex.getCause != null && ex.getCause.getMessage.contains("scores"))
  }

  test("non-long feature arrays are rejected up front") {
    val bad = Seq((1L, Array(1, 2, 3))).toDF("id", "f")
    val ex = intercept[IllegalArgumentException] {
      ModelGate.withScores(bad, "f", "s", ModelGate.LinearStub(3))
    }
    assert(ex.getMessage.contains("array<bigint>"))
  }
}

object ModelGateSpec {
  // local-mode instrumentation: executors share the JVM, so static
  // counters observe per-partition lifecycle across (de)serialized copies
  val opens = new AtomicInteger(0)
  val batchSizes = new ConcurrentLinkedQueue[Integer]()

  class CountingModel extends ModelGate.Model {
    override def open(): ModelGate.Session = {
      opens.incrementAndGet()
      batch => { batchSizes.add(batch.length); batch.map(_.sum) }
    }
  }

  class BrokenModel extends ModelGate.Model {
    override def open(): ModelGate.Session =
      batch => batch.map(_.sum).drop(1) // one score short
  }
}
