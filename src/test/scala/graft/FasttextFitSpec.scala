package graft

import java.security.MessageDigest

import scala.math.BigDecimal.RoundingMode

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** pipeline_fasttext_fit differential test: the distributed hashed
  * bag-of-words LR trainer — md5 feature hashing, two bucket-keyed
  * gradient steps, margin accuracies, top-20-by-|w2| readout — must match
  * a sequential plain-Scala recomputation with identical rounding, and
  * must visibly LEARN: the label marker's hash bucket surfaces as the
  * top-ranked, only-positive, strengthening weight.
  */
class FasttextFitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"
  private val B = 256

  private def r6(x: Double): Double =
    BigDecimal(x + 1e-9).setScale(6, RoundingMode.HALF_UP).toDouble
  private def r4(x: Double): Double =
    BigDecimal(x + 1e-8).setScale(4, RoundingMode.HALF_UP).toDouble

  /** Same bucket arithmetic as the query and its oracle: first 8 hex chars
    * of md5("ft:" || term) as an unsigned int, mod B.
    */
  private def bucket(term: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(("ft:" + term).getBytes("UTF-8"))
    val hex = d.take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16) % B
  }

  private def queryRows() =
    SparkEntry.queries("pipeline_fasttext_fit")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))

  test("distributed hashed-LR trainer matches the sequential reference") {
    val feats = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("text")).collect().map(_.getString(0))
      .filter(_.nonEmpty)
      .map(t => t.split(" ").filter(_.nonEmpty))
      .filter(_.nonEmpty)
      .map { toks =>
        val y = if (toks.count(_ == "spark") >= 2) 1.0 else 0.0
        val nw = toks.length.toDouble
        (y, toks.groupBy(bucket).map { case (b, ts) => b -> ts.length / nw })
      }
    val n = feats.length.toDouble
    val g1 = feats
      .flatMap { case (y, xs) => xs.map { case (b, x) => b -> (0.5 - y) * x } }
      .groupBy(_._1).map { case (b, vs) => b -> r6(vs.map(_._2).sum) }
    val w1 = g1.map { case (b, g) => b -> r6(-g / n) }
    val b1 = r6(-r6(feats.map(0.5 - _._1).sum) / n)
    def margin(w: Map[Long, Double], b0: Double)(xs: Map[Long, Double]) =
      r6(xs.map { case (b, x) => w(b) * x }.sum) + b0
    def acc(w: Map[Long, Double], b0: Double) = r4(feats.map { case (y, xs) =>
      val pred = if (margin(w, b0)(xs) > 1e-9) 1.0 else 0.0
      if (pred == y) 1.0 else 0.0
    }.sum / n)
    val p = feats.map { case (y, xs) =>
      (y, xs, 1.0 / (1.0 + math.exp(-margin(w1, b1)(xs))))
    }
    val g2 = p
      .flatMap { case (y, xs, pp) => xs.map { case (b, x) => b -> (pp - y) * x } }
      .groupBy(_._1).map { case (b, vs) => b -> r6(vs.map(_._2).sum) }
    val w2 = w1.map { case (b, w) => b -> r6(w - g2(b) / n) }
    val (acc1, acc2) = (acc(w1, b1),
      acc(w2, r6(b1 - r6(p.map { case (y, _, pp) => pp - y }.sum) / n)))
    val want = w1.keys.toSeq.map(b => (b, w1(b), w2(b)))
      .sortBy { case (b, _, w) => (-math.abs(w), b) }.take(20)
      .map { case (b, a, c) => (b, a, c, acc1, acc2) }.toSet

    val got = queryRows().toSet
    assert(got == want,
      s"hashed-LR fit differs\n got-want: ${(got diff want).take(3)}\n" +
        s" want-got: ${(want diff got).take(3)}")
  }

  test("the marker's bucket is the top-ranked, dominant, strengthening weight") {
    val rows = queryRows().sortBy { case (b, _, w, _, _) => (-math.abs(w), b) }
    assert(rows.length == 20)
    val (topBucket, tw1, tw2, a1, a2) = rows.head
    assert(topBucket == bucket("spark"),
      s"top |w2| bucket $topBucket is not the marker's ${bucket("spark")}")
    assert(tw1 > 0 && tw2 > tw1,
      s"marker weight not positive/strengthening: $tw1 -> $tw2")
    // Small-sample correlations may hand other buckets slightly positive
    // weights; the marker must DOMINATE them, not merely edge them out.
    val maxOther = rows.tail.map(_._3).max
    assert(tw2 > 3 * math.max(0.0, maxOther),
      s"marker weight $tw2 does not dominate runner-up $maxOther")
    Seq(a1, a2).foreach(a => assert(a >= 0.0 && a <= 1.0))
  }
}
