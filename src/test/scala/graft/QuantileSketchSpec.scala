package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Histogram-quantile invariant, independent of the DuckDB oracle: the
  * estimate is a bucket UPPER edge, so it sits within one bucket width
  * above the discrete quantile; the interpolated exact quantile lies at
  * most one inter-value gap below that. 2× the bucket width is a safe
  * deterministic bound on this dense data and catches an off-by-one in
  * the cumulative walk or a mis-bucketed value (either shifts the
  * estimate by whole buckets).
  */
class QuantileSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  for (sf <- Seq("0.001", "0.01")) {
    test(s"histogram quantile estimates sit within the bucket bound at sf$sf") {
      val dir = s"/root/testdata/sf$sf"
      val rng = spark.read.parquet(s"$dir/orders.parquet")
        .selectExpr("min(o_totalprice) mn", "max(o_totalprice) mx")
        .collect().head
      val width = (rng.getDouble(1) - rng.getDouble(0)) / 1024.0
      val rows = Extras.quantileSketch.run(spark, dir)
        .select("q", "hist_est", "exact_cont").collect()
      assert(rows.length == 3)
      rows.foreach { r =>
        val (q, est, exact) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
        assert(math.abs(est - exact) <= 2 * width,
          s"p$q: |$est - $exact| above ${2 * width}")
      }
    }
  }
}
