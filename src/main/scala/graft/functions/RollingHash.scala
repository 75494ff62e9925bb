package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native polynomial rolling hash (base 31, 31-bit mask) over a string's
  * code points — the incremental-hash primitive under Rabin-Karp chunking
  * (ta_rolling_hash).
  *
  * Replaces the `aggregate(transform(sequence(...), i -> ascii(substr(...))))`
  * higher-order formulation, which paid an interpreted lambda dispatch AND
  * an O(i) UTF-8 seek per character (quadratic per document). This is a
  * single forward pass in whole-stage codegen, same fold: h = (h*31 + cp)
  * & 0x7FFFFFFF per code point, matching DuckDB's
  * `list_reduce(ord(substr(...)))` oracle exactly (ord = Unicode code
  * point; the loop advances by code point, not UTF-16 unit).
  */
case class RollingHash31(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    RollingHash31.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash31.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash31 =
    copy(child = newChild)
}

object RollingHash31 {
  /** Called from generated code: decodes code points straight off the
    * UTF-8 bytes (no intermediate String/char[] copy — this expression
    * exists to remove per-row overhead). RollingHashSpec proves equality
    * with the String.codePointAt fold on multi-byte and surrogate cases.
    */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      val packed = Utf8Decode.step(bytes, i)
      h = (h * 31L + Utf8Decode.cp(packed)) & 0x7FFFFFFFL
      i += Utf8Decode.len(packed)
    }
    h
  }

  def apply(c: Column): Column =
    GraftShim.column(RollingHash31(GraftShim.expression(c)))
}
