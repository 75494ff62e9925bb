package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{lit, shiftleft}

/** Z-ORDER (Morton-curve) multi-dimensional layout — the clustering step
  * every large lakehouse runs when queries filter on TWO dimensions:
  * [[Compaction]]'s range layout makes file-level min/max selective on
  * ONE key and useless on every other, while interleaving the bits of
  * two normalized keys places rows so that any contiguous Morton range
  * is a small RECTANGLE in (a, b) space — every file's footer min/max
  * becomes selective on BOTH dimensions at once (each extra bit of
  * Morton prefix halves one dimension's span, alternating).
  *
  * The spread is the classic magic-mask bit interleave — pure codegen
  * integer arithmetic (shifts, masks, ors), no UDF, identical semantics
  * in DuckDB for the oracle.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to the even bit positions of a 32-bit
    * value: abcd… → 0a0b0c0d….
    */
  def spread16(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit keys: a on even bits, b on odd. */
  def morton2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Z-order compaction: `n` range partitions on the Morton code of
    * `(a, b)`, rows sorted by the code within each — the two-dimensional
    * sibling of [[Compaction.compactToRange]]. Both `a` and `b` must be
    * 16-bit-normalized by the caller (rank or modulo), as production
    * Z-order implementations do.
    */
  def compactToZ(df: DataFrame, n: Int, a: Column, b: Column): DataFrame = {
    val z = morton2(a, b).as("z_code")
    df.withColumn("z_code", z)
      .repartitionByRange(n, new Column("z_code"))
      .sortWithinPartitions(new Column("z_code"))
      .drop("z_code")
  }
}
