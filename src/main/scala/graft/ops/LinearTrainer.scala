package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** In-engine training for the [[ModelGate]] slot — the step that converts
  * the gate from stub-proven to model-proven with zero native
  * dependencies: a batch perceptron (Rosenblatt 1958; the
  * fastText/FineWeb-Edu linear-classifier-head shape) trained by K full
  * gradient passes, entirely in exact long arithmetic so a SQL oracle
  * replays training bit-for-bit.
  *
  * '''Scale shape''' (the `q_classifier_tree` discipline): the model is
  * driver-sized (dim longs) and rides into executors as expression
  * literals; each epoch is ONE map-side-combined aggregate over the
  * (features, label) projection — partial gradient sums per partition,
  * one dim-wide row collected per pass. The projection is persisted for
  * the K passes so the corpus is scanned once, not K times; at 100 TB
  * that cache is dim longs + a label per row, orders of magnitude under
  * the corpus.
  *
  * '''Exactness.''' Weights start at zero; pass k computes
  * ŷᵢ = [Σⱼ wⱼ·xᵢⱼ ≥ 0] and wⱼ += Σᵢ (yᵢ − ŷᵢ)·xᵢⱼ — integer sums are
  * order-independent, so the result is invariant to partitioning and
  * replayable as K unrolled SQL passes.
  *
  * Reference analog: the user-supplied function/SerDe plugin point the
  * framework lifecycles (pulsar-functions/api-java/src/main/java/org/
  * apache/pulsar/functions/api/SerDe.java) — here the plugged model is
  * produced by the engine itself.
  */
object LinearTrainer {

  /** A trained linear head served through the same [[ModelGate]] plumbing
    * as any external model: score = Σ wⱼ·fⱼ in exact long arithmetic. */
  final case class TrainedLinear(weights: Array[Long]) extends ModelGate.Model {
    require(weights.nonEmpty && weights.length <= 4096,
      s"bad weight count ${weights.length}")
    override def open(): ModelGate.Session = { batch =>
      batch.map { f =>
        val n = math.min(weights.length, f.length)
        var s = 0L; var i = 0
        while (i < n) { s += weights(i) * f(i); i += 1 }
        s
      }
    }
  }

  /** Σⱼ wⱼ·featCol[j] as a codegen'd column (dim literal terms). */
  private def dot(featCol: String, w: Array[Long]): Column =
    w.zipWithIndex.map { case (wj, j) =>
      element_at(col(featCol), j + 1) * lit(wj)
    }.reduce(_ + _)

  /** K batch-perceptron passes over `data` — `featCol` array<bigint> of
    * length ≥ dim, `labelCol` ∈ {0, 1} — returning the trained weights.
    * Deterministic for a given (data, dim, epochs): zero init, integer
    * gradients, no shuffling or sampling. */
  def trainPerceptron(data: DataFrame, featCol: String, labelCol: String,
                      dim: Int, epochs: Int): Array[Long] = {
    require(dim >= 1 && dim <= 256, s"bad dim $dim")
    require(epochs >= 1 && epochs <= 64, s"bad epochs $epochs")
    val proj = data.select(col(featCol), col(labelCol).cast("long")
      .as("__y")).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // Overflow headroom is enforced against the MEASURED feature
      // magnitude and row count (one cheap aggregate over the persisted
      // projection), not a documented promise — the HITS discipline:
      //  - a per-pass gradient sum is Σᵢ errᵢ·xᵢⱼ with |err| ≤ 1, so it
      //    is bounded by n·max|x|;
      //  - the training/serving dot product is Σⱼ wⱼ·xⱼ, bounded by
      //    dim·max|w|·max|x|.
      // Both must clear Int64 with 4× headroom. The per-pass weight bound
      // below covers the NEXT pass's dot product and serving on any
      // feature vector within the measured magnitude.
      val stats = proj.agg(
        count(lit(1)).as("__n"),
        max(array_max(transform(col(featCol), x => abs(x)))).as("__mf"))
        .head()
      val n = stats.getLong(0)
      val maxF = math.max(1L,
        if (stats.isNullAt(1)) 0L else stats.getLong(1))
      val headroom = Long.MaxValue / 4
      require(maxF <= headroom / math.max(1L, n) && maxF <= headroom / dim,
        s"feature magnitude $maxF overflows: n=$n rows, dim=$dim")
      val wBound = headroom / (dim.toLong * maxF)
      var w = Array.fill(dim)(0L)
      for (pass <- 1 to epochs) {
        val err = col("__y") - when(dot(featCol, w) >= 0L, 1L).otherwise(0L)
        val grads = (0 until dim).map(j =>
          sum(col("__err") * element_at(col(featCol), j + 1)).as(s"g$j"))
        val row = proj.withColumn("__err", err)
          .agg(grads.head, grads.tail: _*).head()
        w = Array.tabulate(dim)(j =>
          w(j) + (if (row.isNullAt(j)) 0L else row.getLong(j)))
        val maxW = w.map(math.abs).max
        require(maxW <= wBound,
          s"weight overflow risk after pass $pass: max |w| = $maxW > " +
            s"2^61 / (dim $dim x max|feature| $maxF) = $wBound")
      }
      w
    } finally { proj.unpersist(); () }
  }
}
