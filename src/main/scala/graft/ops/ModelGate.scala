package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Pluggable batch model-inference scorer — the FineWeb-Edu / Llama-3
  * classifier-gate shape: modern curation scores every document with a
  * TRAINED model (an edu-quality classifier over embeddings, a reward
  * model, a fastText gate) and thresholds the score as one more cascade
  * rule. The model is a user-supplied black box; the engine owns the
  * distribution plumbing:
  *
  *  - the model object is '''broadcast once''' (weights ship to each
  *    executor once per job, not per task);
  *  - one '''session per partition''', built lazily — the slot where a
  *    real implementation constructs its native runtime (ONNX session,
  *    JNI tokenizer), amortized over every row in the partition, never
  *    per row;
  *  - rows flow through in '''fixed-size batches''' (the shape vectorized
  *    inference wants), order-preserving, with null feature rows bypassing
  *    the session (null score → the cascade's null-fails-closed rule).
  *
  * `mapPartitions` is justified here (SURVEY §7 preference order): the
  * computation is an opaque user binary, not an expression Catalyst could
  * see through — the same reason the codec shims use it. The scan stays
  * shuffle-free: scoring adds no exchange, only a codegen break at the
  * partition boundary.
  *
  * The in-tree [[LinearStub]] keeps the repo's integer-exact oracle
  * discipline (long features, long score, md5-derived weights) so
  * `q_model_gate` replays bit-for-bit in DuckDB; a float model plugs in
  * through the same contract with its own tolerance story.
  *
  * Reference analog: the user-supplied SerDe plugin point — an opaque
  * per-record binary step the framework batches and lifecycles
  * (pulsar-functions/api-java/src/main/java/org/apache/pulsar/functions/
  * api/SerDe.java; instance lifecycle in JavaInstanceRunnable).
  */
object ModelGate {

  /** The model plug: serializable weights + a session factory. */
  trait Model extends Serializable {
    /** Build a per-partition inference session. Called at most once per
      * partition (not at all for empty ones); a real implementation
      * allocates its native runtime here and may assume thread
      * confinement. */
    def open(): Session
  }

  /** A live inference session: scores fixed-size batches. */
  trait Session {
    /** Score one batch; MUST return exactly `batch.length` scores in
      * input order. Null rows never reach the session. */
    def scoreBatch(batch: Array[Array[Long]]): Array[Long]
  }

  /** Deterministic linear stub model: weight i = hash16("w:i") − 32768
    * (the md5-nibble derivation the SRP planes use, so the DuckDB oracle
    * rebuilds identical weights in SQL); score = Σ wᵢ·fᵢ in exact long
    * arithmetic. Stands in for a trained classifier head. */
  final case class LinearStub(dim: Int) extends Model {
    require(dim >= 1 && dim <= 4096, s"bad feature dim $dim")
    override def open(): Session = {
      val w = LinearStub.weights(dim)
      batch => batch.map { f =>
        val n = math.min(dim, f.length)
        var s = 0L; var i = 0
        while (i < n) { s += w(i) * f(i); i += 1 }
        s
      }
    }
  }

  object LinearStub {
    /** w(i−1) = hash16("w:i") − 32768 for i in 1..dim. */
    def weights(dim: Int): Array[Long] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(dim) { i0 =>
        val h = md.digest(s"w:${i0 + 1}".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        java.lang.Integer.parseInt(h.substring(0, 4), 16).toLong - 32768L
      }
    }
  }

  /** `docs` + `scoreCol` appended: broadcast `model`, one session per
    * partition, rows scored in order-preserving batches of `batchSize`.
    * `featCol` must be array<bigint>; a null feature row — or a feature
    * array CONTAINING a null element — yields a null score (fails closed
    * under [[FilterCascade]]'s null-is-failure rule; a partially-null
    * vector is no more trustworthy than a missing one, and must not
    * surface as an opaque executor NPE). */
  def withScores(docs: DataFrame, featCol: String, scoreCol: String,
                 model: Model, batchSize: Int = 256): DataFrame = {
    require(batchSize >= 1 && batchSize <= 65536, s"bad batch size $batchSize")
    val inSchema = docs.schema
    require(inSchema(featCol).dataType == ArrayType(LongType) ||
      inSchema(featCol).dataType == ArrayType(LongType, containsNull = false),
      s"$featCol must be array<bigint>, got ${inSchema(featCol).dataType}")
    val fIdx = inSchema.fieldIndex(featCol)
    val outSchema = inSchema.add(scoreCol, LongType, nullable = true)
    val bc = docs.sparkSession.sparkContext.broadcast(model)
    docs.mapPartitions { it =>
      // lazy: empty partitions never pay session construction
      lazy val session = bc.value.open()
      it.grouped(batchSize).flatMap { rows =>
        val feats = rows.map { r =>
          if (r.isNullAt(fIdx)) null
          else {
            // array<bigint> is nullable-element by default: a null INSIDE
            // the vector fails closed like a null vector, not as an NPE
            val s = r.getSeq[Any](fIdx)
            if (s.exists(_ == null)) null
            else {
              val a = new Array[Long](s.length)
              var i = 0
              s.foreach { v => a(i) = v.asInstanceOf[Long]; i += 1 }
              a
            }
          }
        }
        val live = feats.zipWithIndex.filter(_._1 != null)
        val scores: Map[Int, Long] = if (live.isEmpty) Map.empty else {
          val out = session.scoreBatch(live.map(_._1).toArray)
          // enforce the contract LOUDLY: a model dropping or padding rows
          // would silently misalign scores with documents
          require(out.length == live.length,
            s"model returned ${out.length} scores for ${live.length} rows")
          live.map(_._2).zip(out).toMap
        }
        rows.zipWithIndex.map { case (r, i) =>
          Row.fromSeq(r.toSeq :+ scores.get(i).map(Long.box).orNull)
        }
      }
    }(Encoders.row(outSchema))
  }
}
