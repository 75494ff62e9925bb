package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** ta_kn_logprob differential + the smoothing LAW: interpolated
  * Kneser-Ney is only a probability model if, for every context w1, the
  * smoothed P(w2|w1) sums to exactly 1 over the continuation vocabulary —
  * the discounted mass (D x type-count) must equal what the continuation
  * distribution redistributes. A wrong discount, a missed max(,0), or a
  * continuation count built from TOKENS instead of TYPES all break the
  * law. The census itself is differentialed against a sequential
  * plain-Scala recomputation.
  */
class KnSmoothingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"
  private val D = 0.75

  private def corpus() = spark.read.parquet(s"$dir/documents.parquet")
    .select(col("doc_id"), col("text"))
    .collect().map(r => (r.getLong(0),
      r.getString(1).split(" ").filter(_.nonEmpty)))
    .filter(_._2.length >= 2)

  private def model(docs: Array[(Long, Array[String])]) = {
    val c12 = docs.flatMap { case (_, tk) => tk.sliding(2).map(p => (p(0), p(1))) }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val ctx = c12.groupBy(_._1._1).map { case (w1, m) =>
      w1 -> (m.values.sum, m.size.toLong)
    }
    val cont = c12.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size.toLong }
    val nall = c12.size.toLong
    (c12, ctx, cont, nall)
  }

  private def pkn(c12: Map[(String, String), Long],
      ctx: Map[String, (Long, Long)], cont: Map[String, Long], nall: Long)(
      w1: String, w2: String): Double = {
    val (c1, n1f) = ctx(w1)
    (math.max(c12((w1, w2)) - D, 0.0) + D * n1f * (cont(w2).toDouble / nall)) / c1
  }

  test("smoothed probabilities sum to 1 for every context") {
    val (c12, ctx, cont, nall) = model(corpus())
    val vocab = cont.keys.toSeq
    for (w1 <- ctx.keys) {
      val s = vocab.map { w2 =>
        val (c1, n1f) = ctx(w1)
        val raw = c12.getOrElse((w1, w2), 0L)
        (math.max(raw - D, 0.0) + D * n1f * (cont(w2).toDouble / nall)) / c1
      }.sum
      assert(math.abs(s - 1.0) < 1e-9, s"context '$w1' sums to $s, not 1")
    }
  }

  test("distributed KN census matches the sequential reference") {
    val docs = corpus()
    val (c12, ctx, cont, nall) = model(docs)
    def r4(x: Double) = BigDecimal(x + 1e-8)
      .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    def r2(x: Double) = BigDecimal(x + 1e-6)
      .setScale(2, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = docs.map { case (id, tk) =>
      val pairs = tk.sliding(2).map(p => (p(0), p(1))).toSeq
      val nll = -pairs.map(p => math.log(pkn(c12, ctx, cont, nall)(p._1, p._2))).sum
      val n = pairs.length.toLong
      (id, n, r4(nll / n), r2(math.exp(nll / n)))
    }.toSet
    val got = SparkEntry.queries("ta_kn_logprob")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSet
    assert(got == want,
      s"KN census differs\n got-want: ${(got diff want).take(3)}\n" +
        s" want-got: ${(want diff got).take(3)}")
    // KN must actually smooth: some rare bigram's KN probability exceeds
    // its MLE (backoff mass flows in) and some frequent one's shrinks.
    val mle = c12.map { case ((w1, w2), c) => (w1, w2) -> c.toDouble / ctx(w1)._1 }
    val shifts = c12.keys.map(k => pkn(c12, ctx, cont, nall)(k._1, k._2) - mle(k))
    assert(shifts.exists(_ > 1e-9) && shifts.exists(_ < -1e-9),
      "KN did not redistribute mass relative to MLE")
  }
}
