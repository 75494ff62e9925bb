package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Top-`p` nearest centroid cells of one vector — the coarse-quantizer
  * ranking of the IVF family as ONE native expression over a PACKED
  * primitive centroid matrix, replacing a join-and-rank plan shape.
  *
  * Why an expression: ranking N vectors against k centroids is N·k·d
  * flops however it is phrased, but the phrasing sets the constant. The
  * round-8 shape (broadcast nested-loop join → per-pair project →
  * row_number window) paid ~1 µs per (vector, centroid) PAIR — row
  * iteration, virtual ArrayData access, a BigDecimal round per pair, and
  * an N·k-row exchange into the window; the round-9 g10 probe measured
  * it at 179–292 s of a 320 s query (graft.ProbeKnn). Here the whole
  * per-vector scan is one eval: the vector is unpacked once to a
  * primitive double[], centroids live in a flat double[] shared across
  * rows, the inner loop is pure multiply-adds, and only candidates that
  * can still enter the current top-p pay the exact HALF_UP rounding.
  * CodegenFallback costs one interpreted dispatch per ROW (~µs) against
  * k·d = O(10⁵) flops per row — noise; the surrounding stage stays
  * whole-stage-codegen, and the plan is MAP-ONLY (no join, no window,
  * no exchange).
  *
  * EXACTNESS (the oracle contract): distances accumulate in the same
  * ascending-index IEEE fold as [[ArrayDot.dot]] and DuckDB's
  * `list_dot_product`, with the same association
  * `(e·e − 2·e·c) + c·c`; ranking uses `round(d2 + 1e-9, 6)` via the
  * identical `BigDecimal.valueOf(...).setScale(6, HALF_UP)` Spark's
  * Round generates, with ascending-cell tie-break — so the emitted
  * (cell, d2_raw) pairs are bit-identical to the join+window plan's.
  * The skip guard is sound at EVERY d2 magnitude: round6 moves a value
  * by at most 5e-7 (the HALF_UP step) PLUS ulp(x)/2 (BigDecimal.valueOf
  * goes through Double.toString, whose decimal value sits within half an
  * ulp of x — negligible for small d2 but dominant once d2 grows past
  * ~2^33, where ulp(x) > 1e-6), so a candidate with
  * `d2 + 1e-9 > worst_r6 + 5e-7 + ulp(d2 + 1e-9)` cannot round into a
  * tie or below; only near-top candidates reach BigDecimal.
  *
  * Scale posture: the centroid matrix rides in the expression (plan
  * binary, one copy per executor) — k ≤ ~10⁵ cells is MBs; flat coarse
  * quantization itself stops making sense past ~10M vectors (see
  * KnnSubCellThreshold's scale note), where a hierarchical quantizer
  * replaces this operator wholesale.
  */
case class CellTopK(child: Expression, cells: Array[Long],
    flat: Array[Double], d: Int, p: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cell", LongType, nullable = false),
    StructField("d2_raw", DoubleType, nullable = false))),
    containsNull = false)

  /** Centroid self-dots, same ascending fold as ArrayDot. */
  @transient private lazy val cc: Array[Double] = {
    val k = cells.length
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      var s = 0.0
      var i = 0
      val off = j * d
      while (i < d) { val x = flat(off + i); s += x * x; i += 1 }
      out(j) = s
      j += 1
    }
    out
  }

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData].toDoubleArray()
    var ee = 0.0
    var i = 0
    while (i < d) { ee += e(i) * e(i); i += 1 }
    val k = cells.length
    val n = math.min(p, k)
    val topR6 = new Array[Double](n)
    val topCell = new Array[Long](n)
    val topD2 = new Array[Double](n)
    var filled = 0
    var j = 0
    while (j < k) {
      var qc = 0.0
      val off = j * d
      i = 0
      while (i < d) { qc += e(i) * flat(off + i); i += 1 }
      val d2 = (ee - 2.0 * qc) + cc(j)
      val x = d2 + 1e-9
      // Sound pre-filter: r6 ∈ [x − 5e-7 − ulp(x), x + 5e-7 + ulp(x)]
      // (HALF_UP step + the Double.toString half-ulp, see scaladoc);
      // past the guard the candidate cannot beat or tie the current
      // worst at ANY d2 magnitude.
      if (filled < n || x <= topR6(filled - 1) + 5e-7 + math.ulp(x)) {
        val r6 = round6(x)
        val cell = cells(j)
        if (filled < n || r6 < topR6(filled - 1) ||
            (r6 == topR6(filled - 1) && cell < topCell(filled - 1))) {
          var pos = if (filled < n) filled else n - 1
          while (pos > 0 && (r6 < topR6(pos - 1) ||
              (r6 == topR6(pos - 1) && cell < topCell(pos - 1)))) {
            topR6(pos) = topR6(pos - 1)
            topCell(pos) = topCell(pos - 1)
            topD2(pos) = topD2(pos - 1)
            pos -= 1
          }
          topR6(pos) = r6
          topCell(pos) = cell
          topD2(pos) = d2
          if (filled < n) filled += 1
        }
      }
      j += 1
    }
    val rows = new Array[Any](filled)
    i = 0
    while (i < filled) { rows(i) = InternalRow(topCell(i), topD2(i)); i += 1 }
    new GenericArrayData(rows)
  }

  override protected def withNewChildInternal(newChild: Expression): CellTopK =
    copy(child = newChild)
}
