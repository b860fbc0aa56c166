package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ExprColumn
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Σ a(i)·b(i) over two double arrays, summed strictly in ELEMENT ORDER —
  * exactly the left fold `aggregate(zip_with(a, b, (x, y) -> x * y), 0D,
  * (acc, v) -> acc + v)` computes — as one native codegen'd expression.
  *
  * Why it exists (optimization guide §4, r07): Spark's higher-order
  * functions (`aggregate`/`zip_with`/`transform`) evaluate their lambda
  * INTERPRETED per element, so the cosine verify of the vector near-dup
  * kernel paid ~122k candidate pairs × 4 folds × 64 dims of interpreted
  * lambda calls in a single post-shuffle task. The generated code calls the
  * static [[ArrayDot.dot]] loop directly inside the enclosing whole-stage
  * span. Bit-identical by construction: IEEE addition in the same order;
  * the self-application ArrayDot(a, a) likewise equals
  * `aggregate(transform(a, x -> x * x), 0D, +)` (gated in OpsSpec).
  *
  * Pinned preconditions (loud, not lenient): both arrays non-null (the
  * standard BinaryExpression null-propagation applies), EQUAL length, no
  * null elements — embedding columns are fixed-dimension by corpus
  * invariant, and a silent truncation or null-swallow here would diverge
  * from the zip_with spelling instead of failing visibly.
  */
case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    ArrayDot.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ArrayDot.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {

  /** Column form: `ArrayDot(col("ea"), col("eb"))`. */
  def apply(a: Column, b: Column): Column =
    ExprColumn.column(ArrayDot(ExprColumn.expression(a), ExprColumn.expression(b)))

  /** Element-order left-fold dot product. Called from generated code (see
    * doGenCode) — keep the signature (ArrayData, ArrayData) => double and
    * the method static-forwardable.
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"array_dot needs equal-length arrays, got $n vs ${b.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      // loud on null elements: ArrayData.getDouble on a null slot would
      // silently read 0.0 where the zip_with spelling propagated NULL
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(s"array_dot input has a null element at index $i")
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}
