package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftColumnShim => ExpressionUtils}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the hot paths the built-in functions can't
  * express efficiently (preference order per SURVEY §7: compose built-ins
  * first; a native Expression only where that loses an order of magnitude).
  *
  * Both are allocation-light inner loops evaluated per row; CodegenFallback
  * keeps them inside the generated pipeline (one virtual call per row, no
  * serialization boundary — still far cheaper than a Scala UDF's
  * encoder round-trip).
  */

/** Merge-intersection count of two SORTED long arrays — the pairwise scorer
  * for hashed-shingle Jaccard. O(|a|+|b|) comparisons, zero allocation,
  * versus array_intersect's per-pair hash-set build. */
case class SortedLongIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression) =
    copy(left = newLeft, right = newRight)
}

/** Fused MinHash signature: for each seed s in 0 until numHashes, the minimum
  * of md5(s ‖ ":" ‖ shingle) over the shingle array, as lowercase hex —
  * byte-identical to `min(md5(concat(seed, ':', shingle)))` (the DuckDB
  * oracle's formulation) but with one reused MessageDigest and no
  * per-seed array traversal / UTF8String churn. */
case class MinHashSignature(child: Expression, numHashes: Int)
  extends UnaryExpression with CodegenFallback {
  // empty shingle sets produce [null × N] (min over nothing), so elements
  // are nullable
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_signature"

  @transient private lazy val seedPrefixes: Array[Array[Byte]] =
    Array.tabulate(numHashes)(s => s"$s:".getBytes("UTF-8"))

  private def lessUnsigned(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private val hexChars = "0123456789abcdef".toCharArray
  private def hex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) // min over an empty set is null PER SEED — [null × N], the
      // same shape the compositional array(array_min(...)) form produces
      return new GenericArrayData(new Array[Any](numHashes))
    val md = MessageDigest.getInstance("MD5")
    val mins = new Array[Array[Byte]](numHashes)
    // one scratch digest buffer: digest(buf,off,len) writes in place (and
    // resets), so the hot loop allocates only when a new minimum survives —
    // rare after the first few shingles — instead of 16×|shingles| times
    val scratch = new Array[Byte](16)
    var i = 0
    while (i < n) {
      val sb = arr.getUTF8String(i).getBytes
      var s = 0
      while (s < numHashes) {
        md.update(seedPrefixes(s))
        md.update(sb)
        md.digest(scratch, 0, 16)
        if (mins(s) == null || lessUnsigned(scratch, mins(s)))
          mins(s) = scratch.clone()
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(d => UTF8String.fromString(hex(d))))
  }

  override def nullable: Boolean = true
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** Dot product of two float vectors in double precision — the inner loop of
  * every similarity-search operator. Fully codegen'd (doGenCode): the
  * generated loop reads primitive floats straight out of the columnar
  * ArrayData with no per-element boxing or intermediate array, unlike
  * zip_with+aggregate which materializes a boxed lambda result per element.
  * Accumulation is left-to-right in element order, matching the
  * zip_with/aggregate formulation bit-for-bit. Elements must be non-null;
  * length mismatch scores the common prefix. */
case class FloatVectorDot(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vector_dot"

  /** Primitive accessor per side: float or double element arrays. */
  private def getterName(e: Expression): String = e.dataType match {
    case ArrayType(FloatType, _) => "getFloat"
    case ArrayType(DoubleType, _) => "getDouble"
    case other => throw new IllegalArgumentException(
      s"float_vector_dot expects array<float|double>, got ${other.simpleString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val aDouble = getterName(left) == "getDouble"
    val bDouble = getterName(right) == "getDouble"
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bDouble) b.getDouble(i) else b.getFloat(i).toDouble
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
  : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.${getterName(left)}($i)
         |        * (double) $b.${getterName(right)}($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression) =
    copy(left = newLeft, right = newRight)
}

object GraftExpressions {
  def float_vector_dot(a: Column, b: Column): Column =
    ExpressionUtils.column(FloatVectorDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def sorted_intersect_count(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedLongIntersectCount(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def minhash_signature(shingleArr: Column, numHashes: Int): Column =
    ExpressionUtils.column(MinHashSignature(
      ExpressionUtils.expression(shingleArr), numHashes))
}
