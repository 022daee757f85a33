package graft

import graft.functions.{FloatVectorDot, MinHashSignature, SortedLongIntersectCount}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions registering graft's native expressions for SQL
  * users:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * // or: --conf spark.sql.extensions=graft.GraftExtensions
  * spark.sql("SELECT sorted_intersect_count(a, b), minhash_signature(sh, 16) ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedLongIntersectCount].getName,
        "sorted_intersect_count"),
      (args: Seq[Expression]) => SortedLongIntersectCount(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("float_vector_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "float_vector_dot"),
      (args: Seq[Expression]) => FloatVectorDot(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (args: Seq[Expression]) => {
        val n = args(1) match {
          case Literal(v: Int, _) => v
          case other => other.eval().asInstanceOf[Int]
        }
        MinHashSignature(args(0), n)
      }))
  }
}
