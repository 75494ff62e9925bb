package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** pipeline_sample_weighted differential: the distributed bottom-k over
  * exponential clocks must equal a sequential recompute (MessageDigest
  * md5 + Math.log — fully independent of the native Md5Lanes expression
  * and the SQL), plus the law the estimator exists for: token-weighted
  * sampling selects heavier documents than the corpus average.
  */
class WeightedSampleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.01"

  private def lane0(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
  }

  private def r6(x: Double): Double =
    BigDecimal(x + 1e-9).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  test("bottom-k equals the sequential exponential-clock recompute") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map { r =>
        val w = math.max(r.getString(2).split(" ", -1).count(_.nonEmpty), 1)
        (r.getLong(0), r.getString(1), w.toLong)
      }
    val keyed = docs.map { case (id, src, w) =>
      val u = (lane0(s"11:$id") + 0.5) / 4294967296.0
      (id, src, w, r6(-math.log(u) / w))
    }
    val want = keyed.sortBy(k => (k._4, k._1)).take(50)
      .map(k => k._1 -> ((k._2, k._3, k._4))).toMap
    val got = SparkEntry.queries("pipeline_sample_weighted")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.size == 50)
    assert(got.keySet == want.keySet,
      s"sample diff: ${(want.keySet diff got.keySet).take(3)} / " +
        s"${(got.keySet diff want.keySet).take(3)}")
    val bad = got.collect { case (k, v) if want(k) != v => (k, v, want(k)) }
    assert(bad.isEmpty, s"value mismatches: ${bad.take(3)}")
    // The law: token-weighted sampling favors heavy docs — the sample's
    // mean weight must exceed the corpus mean (62.7 vs 54.3 measured).
    val sampleMean = got.values.map(_._2).sum.toDouble / got.size
    val corpusMean = docs.map(_._3).sum.toDouble / docs.length
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean not above corpus mean $corpusMean")
  }
}
