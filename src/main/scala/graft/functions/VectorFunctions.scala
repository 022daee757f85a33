package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector math over embedding columns (`array<float>`), built from the
  * codegen'd higher-order functions `zip_with`/`aggregate` — no UDF, no
  * serialization boundary, fully whole-stage-codegen'd.
  *
  * Accumulation is in double, left-to-right in element order, so results are
  * deterministic across runs and engines.
  */
object VectorFunctions {

  /** Codegen'd primitive loop (FloatVectorDot); identical accumulation order
    * to the zip_with+aggregate formulation it replaces. */
  def dot(a: Column, b: Column): Column =
    GraftExpressions.float_vector_dot(a, b)

  /** The compositional formulation (reference semantics; used to cross-check
    * the native expression). */
  def dotComposed(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** L2-normalized copy (unit sphere) — train IVF cells on this for cosine
    * search (spherical k-means): cosine neighbors are exactly L2 neighbors
    * on the sphere, so L2-trained cells align with the search metric. */
  def unit(a: Column): Column = {
    val n = norm(a)
    transform(a, x => (x.cast(DoubleType) / n).cast(FloatType))
  }

  /** Squared L2 distance. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast(DoubleType) - y.cast(DoubleType); d * d
      }),
      lit(0.0), (acc, v) => acc + v)

  /** Deterministic pseudo-random hyperplane `p` of dimension `dim`: components
    * in [-0.5, 0.5) derived from md5(p:i) at plan time, so every executor and
    * every run sees the same planes without broadcasting a model. */
  def plane(p: Int, dim: Int): Array[Double] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { i =>
      val h = digest.digest(s"$p:$i".getBytes("UTF-8"))
      val v = ((h(0) & 0xffL) << 16) | ((h(1) & 0xffL) << 8) | (h(2) & 0xffL)
      v.toDouble / (1 << 24).toDouble - 0.5
    }
  }

  /** Sign-random-projection LSH bucket: bit p of the bucket id is the sign of
    * dot(v, plane(p)). Vectors in the same bucket are likely cosine-similar. */
  def srpBucket(v: Column, numPlanes: Int, dim: Int): Column =
    (0 until numPlanes).map { p =>
      when(dot(v, typedlit(plane(p, dim).toSeq)) >= 0, lit(1L << p))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** Ordered multi-probe bucket sequence for SRP LSH: the vector's own
    * bucket first, then one-bit flips in order of INCREASING margin
    * |dot(v, plane(p))| — the planes the vector sits closest to are the
    * likeliest sign disagreements with its true neighbors (multi-probe
    * LSH), the SRP analog of IVF's nprobe-nearest-cells. Element i is the
    * bucket probed at budget i+1; budgets are prefixes, so probe sets NEST
    * and recall is monotone in the budget by construction. */
  def srpProbeBuckets(v: Column, numPlanes: Int, dim: Int): Column = {
    val dots = (0 until numPlanes).map(p => dot(v, typedlit(plane(p, dim).toSeq)))
    val bucket = dots.zipWithIndex.map { case (d, p) =>
      when(d >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    val powers = typedlit((0 until numPlanes).map(p => 1L << p))
    val byMargin = array_sort(array(dots.zipWithIndex.map { case (d, p) =>
      struct(abs(d).as("m"), lit(p).as("p"))
    }: _*))
    concat(array(bucket),
      transform(byMargin, s =>
        bucket.bitwiseXOR(element_at(powers, s.getField("p") + lit(1)))))
  }
}
