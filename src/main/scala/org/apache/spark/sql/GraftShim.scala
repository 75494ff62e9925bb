package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to `private[sql]` Column↔Expression converters, so graft's
  * native Catalyst expressions (e.g. `graft.functions.Fnv1a32`) are usable
  * from the public Column DSL. This is the only file outside the `graft`
  * namespace; it adds no behavior.
  */
object GraftShim {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
