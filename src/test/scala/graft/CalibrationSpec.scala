package graft

import scala.math.BigDecimal.RoundingMode

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** pipeline_quality_calibration differential test: the distributed
  * train-then-evaluate chain — features, two rounded full-batch LR
  * gradient steps, sigmoid scoring, centi-bin reliability census — must
  * match a sequential plain-Scala recomputation with the identical
  * rounding conventions. This is also the strongest check on the shared
  * training builders themselves (every weight digit feeds the bin
  * membership).
  */
class CalibrationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def r6(x: Double): Double =
    BigDecimal(x + 1e-9).setScale(6, RoundingMode.HALF_UP).toDouble
  private def r4(x: Double): Double =
    BigDecimal(x + 1e-8).setScale(4, RoundingMode.HALF_UP).toDouble

  test("distributed calibration census matches the sequential reference") {
    val feats = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("text")).collect().map(_.getString(0))
      .filter(_.nonEmpty)
      .map { text =>
        val toks = text.split(" ").filter(_.nonEmpty)
        val y = if (toks.length >= 60) 1.0 else 0.0
        (y, math.min(toks.length, 200) / 200.0,
          math.min(text.length, 2000) / 2000.0,
          toks.distinct.length.toDouble / toks.length)
      }
    val n = feats.length.toDouble
    // Step 1 (w = 0 → sigmoid = 0.5 closed form), rounded like the query.
    def gradStep(pOf: ((Double, Double, Double, Double)) => Double,
        prev: Array[Double]): Array[Double] = {
      val g = Array(
        feats.map(f => pOf(f) - f._1).sum,
        feats.map(f => (pOf(f) - f._1) * f._2).sum,
        feats.map(f => (pOf(f) - f._1) * f._3).sum,
        feats.map(f => (pOf(f) - f._1) * f._4).sum).map(r6)
      prev.zip(g).map { case (w, gi) => r6(w - gi / n) }
    }
    val w1 = gradStep(_ => 0.5, Array(0.0, 0.0, 0.0, 0.0))
    def sig(w: Array[Double])(f: (Double, Double, Double, Double)): Double =
      1.0 / (1.0 + math.exp(-(w(0) + w(1) * f._2 + w(2) * f._3 + w(3) * f._4)))
    val w2 = gradStep(sig(w1), w1)
    val want = feats.map { f =>
      val p = sig(w2)(f)
      (math.min(99L, math.floor(p * 100 + 1e-9).toLong), f._1, p)
    }.groupBy(_._1).map { case (bin, xs) =>
      (bin, xs.length.toLong,
        r4(xs.map(_._3).sum / xs.length),
        r4(xs.map(_._2).sum / xs.length))
    }.toSet

    val got = SparkEntry.queries("pipeline_quality_calibration")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSet
    assert(got == want,
      s"calibration census differs\n got-want: ${(got diff want).take(3)}\n want-got: ${(want diff got).take(3)}")
    // Non-degenerate: more than one occupied bin, and some bin carries a
    // mixed positive fraction (there is something to calibrate).
    assert(want.size > 1)
  }
}
