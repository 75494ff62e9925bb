package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Bloom-filter invariants of dedup_bloom_incremental, independent of the
  * DuckDB oracle: membership is ONE-SIDED (a chunk fingerprint present in
  * the existing corpus always hits — no false negatives), so per doc
  * n_bloom_hits ≥ n_exact_hits, and the false-positive rate over the
  * truly-new chunks stays near the m=65536/k=4 design point (~0.2% at
  * this fill; the 5% assert is loose enough to be robust, tight enough to
  * catch a mis-derived bit position or a broken word aggregation, which
  * saturates the filter and pushes FP toward 100%).
  */
class BloomSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  for (sf <- Seq("0.001", "0.01")) {
    test(s"bloom hits are one-sided with a sane FP rate at sf$sf") {
      val rows = CorpusOps.bloomIncremental.run(spark, s"/root/testdata/sf$sf")
        .select("n_chunks", "n_bloom_hits", "n_exact_hits").collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val (n, bloom, exact) = (r.getLong(0), r.getLong(1), r.getLong(2))
        assert(bloom >= exact, s"false negative: $bloom < $exact")
        assert(bloom <= n)
      }
      val trueNeg = rows.map(r => r.getLong(0) - r.getLong(2)).sum
      val falsePos = rows.map(r => r.getLong(1) - r.getLong(2)).sum
      assert(trueNeg > 0, "corpus has no novel chunks — demo degenerate")
      assert(falsePos.toDouble / trueNeg <= 0.05,
        s"FP rate ${falsePos.toDouble / trueNeg} above the design point")
    }
  }
}
