package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-position k-gram hash array: element p (0-based) is the
  * polynomial hash (base 31, 31-bit mask — the [[RollingHash31]] fold) of
  * code points p..p+k-1; length is nCp - k + 1, empty below k code points.
  *
  * Exists for the same reason as [[RollingHash31]]: ta_winnow's first
  * formulation computed each position's hash as
  * `aggregate(transform(sequence(0, k-1), j -> ascii(substring(text, p+j,
  * 1))))` — an interpreted lambda dispatch AND an O(p) UTF-8 seek per
  * character, O(L²) per document, which made ta_winnow the single
  * heaviest query in the sf0.1 bench (9.6 s). This decodes the code
  * points ONCE and emits every window hash in one codegen-called pass —
  * O(L·k) with k a small constant. Semantics are pinned to the DuckDB
  * oracle's `list_reduce(..., ord(substr(...)))` per-position fold;
  * WinnowSpec's bit-by-bit reference and an expression-vs-SQL
  * equality leg prove the match.
  */
case class KgramHash31(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"k must be positive, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    KgramHash31.hashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.KgramHash31.hashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): KgramHash31 =
    copy(child = newChild)
}

object KgramHash31 {
  /** Called from generated code: one UTF-8 decode pass into a code-point
    * buffer, then every k-window fold — no per-position seek.
    */
  def hashes(s: UTF8String, k: Int): GenericArrayData = {
    val bytes = s.getBytes
    var n = 0
    var i = 0
    val cps = new Array[Int](s.numChars()) // >= number of code points
    while (i < bytes.length) {
      val packed = Utf8Decode.step(bytes, i)
      cps(n) = Utf8Decode.cp(packed)
      n += 1
      i += Utf8Decode.len(packed)
    }
    if (n < k) return new GenericArrayData(new Array[Long](0))
    val out = new Array[Long](n - k + 1)
    var p = 0
    while (p <= n - k) {
      var h = 0L
      var j = 0
      while (j < k) {
        h = (h * 31L + cps(p + j)) & 0x7FFFFFFFL
        j += 1
      }
      out(p) = h
      p += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, k: Int): Column =
    GraftShim.column(KgramHash31(GraftShim.expression(c), k))
}
