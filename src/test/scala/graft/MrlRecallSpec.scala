package graft

import scala.math.BigDecimal.RoundingMode

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Similarity

/** sim_topk_mrl differential + recall test.
  *
  * Leg 1 (exact): the distributed two-stage funnel — rounded prefix-cosine
  * top-20 shortlist, exact full-dim rerank — must match a sequential
  * plain-Scala recomputation with the same rounding and tie-breaks
  * (HALF_UP like Spark's round; shortlist MEMBERSHIP is part of the
  * contract, not just final order).
  *
  * Leg 2 (recall): final top-5 vs sim_topk_bruteforce. On these isotropic
  * vectors a 16-dim prefix carries only 1/4 of the (structureless)
  * signal, so the committed floor is deliberately modest — the honest
  * worst case for a funnel; MRL-trained embeddings concentrate semantics
  * in the prefix and sit far above it.
  */
class MrlRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def r6(x: Double): Double =
    BigDecimal(x + 1e-9).setScale(6, RoundingMode.HALF_UP).toDouble
  private def r4(x: Double): Double =
    BigDecimal(x + 1e-8).setScale(4, RoundingMode.HALF_UP).toDouble

  private lazy val vecs: Map[Long, Array[Double]] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").cast("long"),
        expr("transform(embedding, x -> cast(x as double))"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .toMap

  private def dot(a: Array[Double], b: Array[Double], n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  private lazy val reference: Map[Long, Seq[(Long, Double)]] = {
    val dims = vecs.head._2.length
    def cos(a: Array[Double], b: Array[Double], n: Int): Double =
      dot(a, b, n) / (math.sqrt(dot(a, a, n)) * math.sqrt(dot(b, b, n)))
    vecs.keys.filter(_ < 20).map { q =>
      val shortlist = vecs.toSeq.filter(_._1 != q)
        .map { case (id, e) => id -> r6(cos(vecs(q), e, 16)) }
        .sortBy { case (id, c) => (-c, id) }.take(20).map(_._1)
      val top5 = shortlist
        .map(id => id -> cos(vecs(q), vecs(id), dims))
        .sortBy { case (id, c) => (-r6(c), id) }.take(5)
        .map { case (id, c) => id -> r4(c) }
      q -> top5
    }.toMap
  }

  test("distributed MRL funnel matches the sequential reference exactly") {
    val got = Similarity.topkMrl.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
      .map { case (q, rs) => q -> rs.sortBy(_._3).map(x => (x._2, x._4)).toSeq }
    assert(got.keySet == reference.keySet)
    for ((q, want) <- reference)
      assert(got(q) == want, s"query $q: got ${got(q)}, want $want")
  }

  test("funnel recall@5 vs brute force meets the committed floor") {
    val brute = Similarity.topkBrute.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val recall = reference.map { case (q, sel) =>
      (sel.map(_._1).toSet intersect brute(q)).size / 5.0
    }
    val mean = recall.sum / recall.size
    // Measured 0.38 on this isotropic set (16 of 64 structureless dims
    // carry 1/4 of the signal); 0.3 is the stress-margin floor — see the
    // scaladoc for why a modest floor is the honest commitment here.
    assert(mean >= 0.3, s"mean recall@5 $mean below the committed 0.3")
    assert(mean > 0.0)
  }
}
