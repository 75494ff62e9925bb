package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * The `aggregate(zip_with(...))` higher-order formulation is interpreted
  * per element (lambda dispatch per multiply) and dominated the pairwise
  * similarity benchmarks; this expression compiles to a tight primitive
  * loop inside whole-stage codegen. The accumulation is the SAME ascending-
  * index IEEE double fold as the HOF version and DuckDB's
  * `list_dot_product`, so results remain bit-identical — the property the
  * oracle thresholds rely on.
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any =
    ArrayDot.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ArrayDot.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {
  /** Called from generated code. Inputs must be non-null-element
    * array<double> of equal length (the embedding contract).
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
}

object Vectors {
  /** Dot product of two array<double> columns (native codegen loop). */
  def arrDot(a: Column, b: Column): Column =
    GraftShim.column(ArrayDot(GraftShim.expression(a), GraftShim.expression(b)))

  /** L2 norm of an array<double> column. */
  def arrNorm(a: Column): Column = sqrt(arrDot(a, a))
}
