package graft

import scala.math.BigDecimal.RoundingMode

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** pipeline_domain_cap differential: the windowed per-source census must
  * equal a sequential reference that sorts each source's docs by the
  * replicated rounded quality (HALF_UP like Spark's round) with the
  * doc_id tie-break — rank drift, an off-by-one in the K boundary, or a
  * rounding divergence all surface as census mismatches.
  */
class DomainCapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.01"
  private val K = 15

  private def q6(nTokens: Long, nDistinct: Long): Double =
    BigDecimal(0.5 * math.min(nTokens, 200L) / 200.0 +
      0.5 * nDistinct.toDouble / nTokens + 1e-9)
      .setScale(6, RoundingMode.HALF_UP).toDouble

  test("capped census equals the sequential rank-and-sum reference") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map { r =>
        val toks = r.getString(2).split(" ", -1).filter(_.nonEmpty)
        (r.getLong(0), r.getString(1), toks.length.toLong,
          toks.distinct.length.toLong)
      }
    val want = docs.groupBy(_._2).map { case (src, members) =>
      val ranked = members
        .map { case (id, _, nt, nd) => (id, nt, q6(nt, nd)) }
        .sortBy { case (id, _, q) => (-q, id) }
      val kept = ranked.take(K)
      src -> ((members.length.toLong, kept.length.toLong,
        (members.length - kept.length).toLong,
        kept.map(_._2).sum, kept.map(_._3).min))
    }
    val got = SparkEntry.queries("pipeline_domain_cap")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    assert(got.keySet == want.keySet)
    val bad = got.collect { case (k, v) if want(k) != v => (k, v, want(k)) }
    assert(bad.isEmpty, s"census mismatches (got vs want): ${bad.take(3)}")
    // The cap must actually bite on this corpus (every source holds 25
    // docs > K=15) and the cutoff must sit strictly inside the quality
    // range — a cutoff at the source max would mean the ranking is
    // degenerate.
    assert(got.values.forall { case (n, kept, dropped, _, _) =>
      kept == K && dropped == n - K })
    val allQ = docs.map { case (_, _, nt, nd) => q6(nt, nd) }
    assert(got.values.map(_._5).min > allQ.min,
      "cutoff equals the corpus minimum — cap not selective")
  }
}
