package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Similarity

/** sim_topk_sq8 differential + recall test.
  *
  * Leg 1 (exact): the distributed SQ8 pipeline — per-dim min/max, affine
  * 8-bit encode, integer code-space L2, top-5 — must match a sequential
  * plain-Scala recomputation EXACTLY (same IEEE ops on the same doubles,
  * integer distances, so there is no tolerance to hide behind).
  *
  * Leg 2 (recall): embeddings are unit-norm, so code-space L2 ranking
  * approximates the exact cosine ranking; recall@5 against
  * sim_topk_bruteforce commits the measured quantization loss (observed:
  * 0.81 at sf0.001 — the test embeddings are ISOTROPIC, so the top-5 are
  * near-ties separated by less than the quantization step and ranks 3-5
  * legitimately reorder; on real clustered embeddings, where neighbors
  * are separated by structure rather than noise, SQ8 recall approaches 1,
  * which is why it is the default first compression step).
  */
class Sq8RecallSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val vecs: Map[Long, Array[Double]] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").cast("long"),
        expr("transform(embedding, x -> cast(x as double))"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .toMap

  private lazy val referenceTop5: Map[Long, Seq[(Long, Long)]] = {
    val dims = vecs.head._2.length
    val mn = Array.tabulate(dims)(i => vecs.values.map(_(i)).min)
    val mx = Array.tabulate(dims)(i => vecs.values.map(_(i)).max)
    val codes = vecs.map { case (id, e) =>
      id -> Array.tabulate(dims) { i =>
        if (mx(i) == mn(i)) 0.0
        else math.min(255.0, math.max(0.0,
          math.floor((e(i) - mn(i)) / (mx(i) - mn(i)) * 255 + 1e-9)))
      }
    }
    def d2(a: Array[Double], b: Array[Double]): Long = {
      var s = 0.0
      var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s.toLong
    }
    codes.keys.filter(_ < 20).map { q =>
      q -> codes.toSeq.filter(_._1 != q)
        .map { case (id, c) => id -> d2(codes(q), c) }
        .sortBy { case (id, d) => (d, id) }.take(5)
    }.toMap
  }

  test("distributed SQ8 top-5 matches the sequential reference exactly") {
    val got = Similarity.topkSq8.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
      .map { case (q, rs) =>
        q -> rs.sortBy(_._3).map(x => (x._2, x._4)).toSeq
      }
    assert(got.keySet == referenceTop5.keySet)
    for ((q, want) <- referenceTop5)
      assert(got(q) == want, s"query $q: got ${got(q)}, want $want")
  }

  test("recall@5 vs exact cosine brute force meets the committed floor") {
    // Reference d2 computes Σ(a-b)² directly; the declared query expands
    // to s2a + s2b - 2ab. Both are double-exact on ≤2^27 integers, so the
    // two formulations agree bit-for-bit — leg 1 already proved the
    // distributed side; here the RANKING meets the float truth.
    val brute = Similarity.topkBrute.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val recall = referenceTop5.map { case (q, sel) =>
      (sel.map(_._1).toSet intersect brute(q)).size / 5.0
    }
    // Measured 0.81 on this isotropic set (near-tied neighbors reorder
    // within the quantization step); 0.7 is the stress-margin floor.
    val mean = recall.sum / recall.size
    assert(mean >= 0.7, s"mean recall@5 $mean below the committed 0.7")
  }
}
