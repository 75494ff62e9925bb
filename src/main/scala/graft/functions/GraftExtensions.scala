package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}

/** Registers graft's native expressions as SQL functions through the public
  * extensions API, so `spark.sql("SELECT fnv1a32(k), arr_dot(a, b) ...")`
  * works wherever the session is built with
  * `.withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.functions.GraftExtensions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("fnv1a32"),
      new ExpressionInfo(classOf[Fnv1a32].getName, "fnv1a32"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"fnv1a32 expects exactly 1 argument, got ${children.size}")
        Fnv1a32(Cast(children.head, StringType))
      }))
    ext.injectFunction((
      FunctionIdentifier("arr_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "arr_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"arr_dot expects exactly 2 arguments, got ${children.size}")
        // Cast to array<double>: ArrayDot reads 8-byte slots, so a raw
        // array<float> input (e.g. the embeddings column) would otherwise
        // yield garbage from UnsafeArrayData.
        ArrayDot(Cast(children(0), ArrayType(DoubleType)),
          Cast(children(1), ArrayType(DoubleType)))
      }))
    ext.injectFunction((
      FunctionIdentifier("rolling_hash31"),
      new ExpressionInfo(classOf[RollingHash31].getName, "rolling_hash31"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"rolling_hash31 expects exactly 1 argument, got ${children.size}")
        RollingHash31(Cast(children.head, StringType))
      }))
    ext.injectFunction((
      FunctionIdentifier("md5_lanes"),
      new ExpressionInfo(classOf[Md5Lanes].getName, "md5_lanes"),
      (children: Seq[Expression]) => {
        // md5_lanes(value, seedBase, numSeeds) -> array<bigint> of
        // numSeeds*4 portable 32-bit hash lanes.
        require(children.size == 3,
          s"md5_lanes expects 3 arguments (value, seedBase, numSeeds), " +
            s"got ${children.size}")
        def intLit(e: Expression, what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"md5_lanes $what must be an integer literal, got $other")
        }
        Md5Lanes(Cast(children.head, StringType),
          intLit(children(1), "seedBase"), intLit(children(2), "numSeeds"))
      }))
    ext.injectFunction((
      FunctionIdentifier("cdc_cuts"),
      new ExpressionInfo(classOf[CdcCuts].getName, "cdc_cuts"),
      (children: Seq[Expression]) => {
        // cdc_cuts(text, window, maskBits) -> array<bigint> of 1-based
        // code-point cut positions (Rabin-Karp content-defined chunking).
        require(children.size == 3,
          s"cdc_cuts expects 3 arguments (text, window, maskBits), " +
            s"got ${children.size}")
        def intLit(e: Expression, what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"cdc_cuts $what must be an integer literal, got $other")
        }
        CdcCuts(Cast(children.head, StringType),
          intLit(children(1), "window"), intLit(children(2), "maskBits"))
      }))
  }
}
