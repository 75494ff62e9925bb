package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All `numSeeds × 4` portable 32-bit hash lanes of a string in ONE native
  * codegen call: md5("seed:" ++ value) for seeds `seedBase ..
  * seedBase+numSeeds-1`, each 128-bit digest split into four big-endian
  * unsigned 32-bit lanes — bit-identical to the SQL-expressible
  * `('0x' || substr(md5(seed || ':' || v), 1+8*lane, 8))::BIGINT` the DuckDB
  * oracle runs, but without materializing any hex string or paying a `conv`
  * parse per lane. The UTF-8 bytes are extracted once and fed to every
  * seeded digest; a 16-hash MinHash signature costs 4 digest passes and one
  * primitive long-array allocation per shingle. (ExtensionsSpec asserts
  * lane-for-lane equality with the hex/conv formulation.)
  */
case class Md5Lanes(child: Expression, seedBase: Int, numSeeds: Int)
    extends UnaryExpression {
  // Guard at construction (driver), not first evaluation (executor): a
  // direct case-class instantiation bypasses the Column-level apply.
  // No `seedBase + numSeeds` here: with untrusted ints (the SQL surface)
  // the addition can overflow past the check and resurrect the
  // executor-side ArrayIndexOutOfBounds this guard exists to prevent.
  require(seedBase >= 0 && numSeeds > 0 &&
    seedBase <= Md5Lanes.MaxSeed - numSeeds,
    s"seed range [$seedBase, +$numSeeds) outside [0, ${Md5Lanes.MaxSeed})")

  // Fail at analysis, not execution, on a non-string child.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5 lanes require a string child, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Md5Lanes.lanes(input.asInstanceOf[UTF8String], seedBase, numSeeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5Lanes.lanes($c, $seedBase, $numSeeds)")

  override protected def withNewChildInternal(newChild: Expression): Md5Lanes =
    copy(child = newChild)
}

object Md5Lanes {
  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Pre-encoded "seed:" prefixes (one allocation ever, not per row). */
  private[functions] val MaxSeed = 128
  private val prefixes: Array[Array[Byte]] =
    Array.tabulate(MaxSeed)(s => s"$s:".getBytes("UTF-8"))

  /** Called from generated code. */
  def lanes(s: UTF8String, seedBase: Int, numSeeds: Int): ArrayData = {
    val text = s.getBytes
    val out = new Array[Long](numSeeds * 4)
    val digest = md.get()
    var i = 0
    while (i < numSeeds) {
      digest.reset()
      digest.update(prefixes(seedBase + i))
      digest.update(text)
      val d = digest.digest()
      var l = 0
      while (l < 4) {
        out(i * 4 + l) =
          ((d(4 * l) & 0xffL) << 24) | ((d(4 * l + 1) & 0xffL) << 16) |
            ((d(4 * l + 2) & 0xffL) << 8) | (d(4 * l + 3) & 0xffL)
        l += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def apply(c: Column, seedBase: Int, numSeeds: Int): Column =
    GraftShim.column(Md5Lanes(GraftShim.expression(c), seedBase, numSeeds))
}
