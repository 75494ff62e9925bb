package graft

import scala.math.BigDecimal.RoundingMode

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** pipeline_lang_mixture differential + the temperature-sampling laws:
  * the tempered shares must equal a sequential recompute (Math.pow over
  * the collected counts), the shares must sum to ~1, and temperature
  * must do its one job — flatten the distribution (minority languages
  * upweighted above their raw share, the head language pulled below).
  */
class LangMixtureSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.01"

  private def r4(x: Double): Double =
    BigDecimal(x + 1e-8).setScale(4, RoundingMode.HALF_UP).toDouble

  test("tempered shares equal the sequential recompute and the laws hold") {
    val counts = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"), col("text"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (lang, rows) =>
        lang -> ((rows.length.toLong,
          rows.map(_.getString(1).split(" ", -1).count(_.nonEmpty).toLong).sum))
      }
    val total = counts.values.map(_._2).sum.toDouble
    val wgt = counts.map { case (l, (_, nt)) => l -> math.pow(nt / total, 0.3) }
    val sw = wgt.values.sum
    val want = counts.map { case (l, (nd, nt)) =>
      val pTemp = r4(wgt(l) / sw)
      l -> ((nd, nt, r4(nt / total), pTemp,
        BigDecimal(pTemp * 10000).setScale(0, RoundingMode.HALF_UP).toLong))
    }
    val got = SparkEntry.queries("pipeline_lang_mixture")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getLong(5)))).toMap
    assert(got.keySet == want.keySet)
    val bad = got.collect { case (k, v) if want(k) != v => (k, v, want(k)) }
    assert(bad.isEmpty, s"mixture mismatches (got vs want): ${bad.take(3)}")

    // Law 1: tempered shares form a distribution (4-decimal rounding can
    // drift the sum by at most n_langs * 5e-5).
    val sumTemp = got.values.map(_._4).sum
    assert(math.abs(sumTemp - 1.0) <= got.size * 5e-5, s"sum p_temp = $sumTemp")
    // Law 2: temperature flattens — every minority language (raw share
    // below uniform) is upweighted, the head language is downweighted.
    val uniform = 1.0 / got.size
    got.values.foreach { case (_, _, pRaw, pTemp, _) =>
      if (pRaw < uniform - 1e-3) assert(pTemp > pRaw,
        s"minority lang not upweighted: raw $pRaw temp $pTemp")
      if (pRaw > uniform + 1e-3) assert(pTemp < pRaw,
        s"head lang not downweighted: raw $pRaw temp $pTemp")
    }
    // Law 3: the head stays the head — temperature reorders nothing.
    val byRaw = got.toSeq.sortBy(_._2._3)
    val byTemp = got.toSeq.sortBy(_._2._4)
    assert(byRaw.map(_._1) == byTemp.map(_._1), "temperature reordered langs")
  }
}
