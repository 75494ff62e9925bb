package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The nprobe knob must buy recall: probing the 2 nearest quantizer cells
  * has to match the brute-force top-5 at least as well as probing 1 for
  * EVERY query (the probe-2 candidate set is a superset of probe-1's, and
  * a displaced top-5 candidate can only be displaced by a higher-cosine
  * one, so per-query matches are monotone), and strictly better in
  * aggregate on this data — otherwise the second probe is dead weight.
  */
class IvfRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** query_id -> top-5 neighbor set. */
  private def top5(q: Q, dir: String): Map[Long, Set[Long]] =
    q.run(spark, dir).select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (k, rs) =>
        k -> rs.map(_.getLong(1)).toSet
      }

  private def check(dir: String): Unit = {
    val truth = top5(Similarity.topkBrute, dir)
    val p1 = top5(Similarity.topkIvf, dir)
    val p2 = top5(Similarity.topkIvfProbe2, dir)
    val matched1 = truth.map { case (q, t) => q -> (t & p1.getOrElse(q, Set())).size }
    val matched2 = truth.map { case (q, t) => q -> (t & p2.getOrElse(q, Set())).size }
    val (tot1, tot2) = (matched1.values.sum, matched2.values.sum)
    val totTruth = truth.values.map(_.size).sum
    info(f"$dir: recall@5 nprobe=1 ${tot1.toDouble / totTruth}%.3f " +
      f"(${tot1}/$totTruth), nprobe=2 ${tot2.toDouble / totTruth}%.3f " +
      f"($tot2/$totTruth)")
    matched1.foreach { case (q, m1) =>
      assert(matched2(q) >= m1,
        s"query $q: nprobe=2 matched ${matched2(q)} < nprobe=1 $m1")
    }
    assert(tot2 > tot1,
      s"nprobe=2 bought no aggregate recall ($tot2 vs $tot1) — dead probe")
  }

  test("nprobe=2 strictly improves recall@5 vs brute force at sf0.001") {
    check("/root/testdata/sf0.001")
  }

  test("nprobe=2 strictly improves recall@5 vs brute force at sf0.01") {
    check("/root/testdata/sf0.01")
  }
}
