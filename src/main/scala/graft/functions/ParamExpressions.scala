package graft.functions

import org.apache.spark.sql.{Column, GraftColumnShim => ExpressionUtils}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, LeafExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Codegen-CACHE-STABLE parameter expressions for per-micro-batch plans.
  *
  * The persisted probe stores ([[graft.ops.SimHashIndex]],
  * [[graft.ops.MinHashIndex]], [[graft.ops.ExactDedupIndex]], ...) run the
  * SAME query shape every micro-batch with only a handful of scalar
  * parameters changing: the batch ord stamped on appends, and the probe's
  * touched-bucket set. Spark inlines primitive `Literal`s (and `isin`
  * value lists) into the generated Java source, so each batch's plans
  * produce UNIQUE source text and Janino recompiles every generated class
  * on every trigger — measured at ~50 compiles (≈0.5-0.7 s) per batch per
  * store pipeline, the dominant share of the per-batch constant the r18
  * verdict flagged. These expressions route the changing value through
  * `ctx.addReferenceObj` instead — the generated source references a slot
  * in the (per-plan) `references` array and is byte-identical across
  * batches, so the whole-stage cache hits and steady-state compiles drop
  * to zero. The same parameterized-literal idea appears in public Spark
  * derivatives (plan caching via bind-variable literals); here it is scoped
  * to the two store-parameter sites.
  *
  * Both are `foldable = false` BY DESIGN: constant folding would collapse
  * them back into inlined literals and re-break source stability. Keep
  * them out of partition filters (those need foldable literals to prune at
  * planning time — the stores' `pb`/`fpp`/`band` isin filters stay literal,
  * which is free: partition pruning happens at planning and never enters
  * generated code).
  */

/** A long "bind variable": evaluates to a constant for the whole query but
  * is invisible to constant folding and codegen-inlines as a reference
  * lookup, so plans that differ only in this value share generated source. */
case class ParamLong(value: Long) extends LeafExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def prettyName: String = "param_long"
  override def toString: String = s"param_long($value)"

  override def eval(input: InternalRow): Any = value

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    // reference the boxed value, not `this`: the slot load + longValue()
    // JITs to a constant load either way, and the source text carries only
    // the stable reference index
    val ref = ctx.addReferenceObj("paramLong", java.lang.Long.valueOf(value),
      "java.lang.Long")
    ev.copy(
      code = code"final long ${ev.value} = $ref.longValue();",
      isNull = FalseLiteral)
  }
}

/** Set-membership against a referenced long set — the cache-stable form of
  * `col.isin(touched: _*)` for per-batch probe filters on COMPUTED keys
  * (which parquet could never push down anyway; partition-column isin
  * filters should stay literal for planning-time pruning). Mirrors
  * Catalyst's own `InSet` reference discipline but never switches to the
  * value-inlining switch-statement codegen path. Null input yields null,
  * matching `isin` semantics. */
case class LongSetContains(child: Expression, set: Set[Long])
  extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "long_set_contains"

  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a bigint input, got ${other.catalogString}")
    }

  // the hot path is a bounded probe-key set (batch × blocks keys); a
  // hash-set contains with one box per row is noise next to the scan
  @transient private lazy val javaSet: java.util.HashSet[java.lang.Long] = {
    val s = new java.util.HashSet[java.lang.Long](set.size * 2)
    set.foreach(v => s.add(java.lang.Long.valueOf(v)))
    s
  }

  override def nullSafeEval(v: Any): Any =
    javaSet.contains(v.asInstanceOf[java.lang.Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("longSet", javaSet,
      "java.util.HashSet<java.lang.Long>")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $setRef.contains(java.lang.Long.valueOf($c));")
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** Column-level faces of the parameter expressions. */
object Params {
  /** The batch-parameter face of `lit(v: Long)` — same value semantics,
    * codegen-cache-stable across batches. */
  def paramLong(v: Long): Column =
    ExpressionUtils.column(ParamLong(v))

  /** The batch-parameter face of `c.isin(vals: _*)` over long keys. */
  def inLongSet(c: Column, set: Set[Long]): Column =
    ExpressionUtils.column(LongSetContains(ExpressionUtils.expression(c), set))
}
