package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries (Rabin-Karp CDC, the boundary rule of
  * LBFS/rsync-family dedup systems): positions `i` (1-based code points,
  * `i ≥ window`) where the polynomial rolling hash of the last `window`
  * code points has its low `maskBits` bits zero — expected chunk length
  * 2^maskBits, with boundaries that survive insertions/deletions because
  * they depend only on local content (fixed-stride chunking shifts every
  * boundary after an edit; CDC re-synchronizes).
  *
  * The windowed hash is `Σ_{j=0..w-1} cp_{i−j} · 31^j  mod 2^31`,
  * maintained incrementally in one forward pass (subtract the outgoing
  * code point's `31^(w−1)` term, multiply, add — all masked to 31 bits;
  * power-of-two masking makes subtraction safe in two's complement). The
  * DuckDB oracle evaluates the same window sum DIRECTLY (list_transform
  * weighted sum per position, exact in BIGINT) — equal mod 2^31 by
  * construction, so cut positions are bit-portable. The hash rolls
  * continuously across cuts (no reset), matching the classic CDC
  * definition.
  *
  * Code points decode straight off the UTF-8 bytes like [[RollingHash31]];
  * CdcSpec proves equality with a String.codePointAt reimplementation on
  * multi-byte and surrogate inputs.
  */
case class CdcCuts(child: Expression, window: Int, maskBits: Int)
    extends UnaryExpression {
  require(window > 0 && window <= 64, s"window $window outside (0, 64]")
  require(maskBits > 0 && maskBits < 31, s"maskBits $maskBits outside (0, 31)")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cdc cuts require a string child, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CdcCuts.cuts(input.asInstanceOf[UTF8String], window, maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcCuts.cuts($c, $window, $maskBits)")

  override protected def withNewChildInternal(newChild: Expression): CdcCuts =
    copy(child = newChild)
}

object CdcCuts {
  private val Mask31 = 0x7FFFFFFFL

  /** Called from generated code: one forward pass over the UTF-8 bytes,
    * ring buffer of the last `w` code points, cut list in a growable
    * primitive array.
    */
  def cuts(s: UTF8String, w: Int, maskBits: Int): ArrayData = {
    val bytes = s.getBytes
    val cutMask = (1L << maskBits) - 1
    // 31^(w-1) mod 2^31: the outgoing code point's weight.
    var wpow = 1L
    var p = 1
    while (p < w) { wpow = (wpow * 31L) & Mask31; p += 1 }
    val ring = new Array[Long](w)
    var out = new Array[Long](8)
    var nOut = 0
    var h = 0L
    var cpIdx = 0 // code points consumed so far
    var i = 0
    while (i < bytes.length) {
      val packed = Utf8Decode.step(bytes, i)
      val cp = Utf8Decode.cp(packed)
      val len = Utf8Decode.len(packed)
      if (cpIdx >= w) {
        // Evict the code point leaving the window (two's-complement
        // subtraction then mask = subtraction mod 2^31).
        h = (h - (ring(cpIdx % w) * wpow)) & Mask31
      }
      h = (h * 31L + cp) & Mask31
      ring(cpIdx % w) = cp
      cpIdx += 1
      if (cpIdx >= w && (h & cutMask) == 0L) {
        if (nOut == out.length) {
          val bigger = new Array[Long](out.length * 2)
          System.arraycopy(out, 0, bigger, 0, nOut)
          out = bigger
        }
        out(nOut) = cpIdx.toLong
        nOut += 1
      }
      i += len
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, nOut))
  }

  def apply(c: Column, window: Int, maskBits: Int): Column =
    GraftShim.column(CdcCuts(GraftShim.expression(c), window, maskBits))
}
