package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sanity on the logistic-regression trainer beyond the oracle hash: the
  * fit must actually LEARN — the weight on the feature aligned with the
  * label (x1 = clamped word count; the label is n_words >= 60) must be
  * positive and strengthen across steps, and the anti-correlated
  * distinct-ratio weight must move negative (short docs have higher
  * distinct ratios in this corpus). The DuckDB oracle pins the exact
  * values; this spec pins the direction, so a sign error in the gradient
  * (which could still hash-match a same-sign-error oracle) cannot hide.
  */
class QualityFitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("gradient steps move the label-aligned weight up and strengthen it") {
    val rows = SparkEntry.queries("pipeline_quality_fit")(
      spark, "/root/testdata/sf0.001")
      .collect().sortBy(_.getLong(0))
    assert(rows.length == 2)
    val Seq(it1, it2) = rows.toSeq
    val (w1a, w1b) = (it1.getDouble(2), it2.getDouble(2)) // x1 weight
    assert(w1a > 0 && w1b > w1a,
      s"label-aligned weight not strengthening: $w1a -> $w1b")
    val (w3a, w3b) = (it1.getDouble(4), it2.getDouble(4)) // x3 weight
    assert(w3a < 0 && w3b < w3a,
      s"anti-correlated weight not strengthening: $w3a -> $w3b")
    rows.foreach { r =>
      val acc = r.getDouble(5)
      assert(acc >= 0.0 && acc <= 1.0)
    }
  }
}
