package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Longest common prefix of two strings, in CHARACTERS (code points) —
  * the codegen replacement (round 13, guide "eliminate non-codegen
  * expressions in the hot path") for dedup_substring's per-row HOF chain
  *
  *   coalesce(nullif(array_position(transform(sequence(1, least(len, len)),
  *     j -> substring(a, j, 1) = substring(b, j, 1)), false), 0) - 1,
  *     least(length(a), length(b)))
  *
  * which Spark executes as a CodegenFallback lambda dispatch allocating
  * a sequence array, a transformed boolean array and two UTF8String
  * slices per compared character — per ROW of the suffix explosion, in
  * the window stage of the bench's heaviest query. This walks the two
  * byte arrays once, no allocation.
  *
  * Semantics are pinned to the SQL form character by character
  * (LcpSpec: expression-vs-SQL equality on random and adversarial
  * inputs): a character matches iff its full UTF-8 byte run matches, a
  * string that is a character-prefix of the other yields its own length
  * (the coalesce arm), and a string ENDING MID-CODE-POINT (malformed
  * UTF-8) counts that trailing fragment as a character only when both
  * sides end with the identical fragment — exactly how `substring`'s
  * numBytesForFirstByte jump and string equality treat it.
  */
case class Lcp(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    Lcp.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Lcp.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Lcp =
    copy(left = newLeft, right = newRight)
}

object Lcp {
  /** Called from generated code: byte-run walk, one pass, no allocation. */
  def compute(a: UTF8String, b: UTF8String): Long = {
    val na = a.numBytes()
    val nb = b.numBytes()
    var i = 0
    var chars = 0L
    while (i < na && i < nb) {
      val ba = a.getByte(i)
      if (ba != b.getByte(i)) return chars
      val w = UTF8String.numBytesForFirstByte(ba)
      var j = 1
      while (j < w) {
        val p = i + j
        val aHas = p < na
        val bHas = p < nb
        if (!aHas && !bHas) {
          // Both strings end with the same truncated code point: the SQL
          // form's substrings of that final character are byte-identical,
          // so it COUNTS (and both strings are exhausted).
          return chars + 1
        }
        if (!aHas || !bHas || a.getByte(p) != b.getByte(p)) return chars
        j += 1
      }
      i += w
      chars += 1
    }
    chars
  }

  def apply(a: Column, b: Column): Column =
    GraftShim.column(Lcp(GraftShim.expression(a), GraftShim.expression(b)))
}
