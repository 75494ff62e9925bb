package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** q_events_markov: differential against a sequential per-user transition
  * count, plus the law the output exists to satisfy — each from-state's
  * probabilities form EXACTLY a distribution (exact integer ratios of
  * counts summing over a common denominator: the sum is n_from/n_from,
  * bit-exactly 1.0, not approximately).
  */
class MarkovSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.01"

  test("transition matrix equals the sequential count; rows sum to 1") {
    val evs = graft.queries.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").cast("double"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3)))
    val want = evs.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._4, e._2)).map(_._3)
      sorted.zip(sorted.drop(1))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

    val got = SparkEntry.queries("q_events_markov")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, (n, nFrom, prob)) =>
      assert(n == want(k), s"$k: count $n != ${want(k)}")
      assert(prob == n.toDouble / nFrom, s"$k: prob not the exact ratio")
    }
    // Stochastic-matrix law: per from-state, counts sum to n_from, so the
    // probability row sums to n_from/n_from — exactly 1 in exact
    // arithmetic (check via the integer identity, no float tolerance).
    got.groupBy(_._1._1).foreach { case (from, rows) =>
      val ns = rows.values.map(_._1).sum
      val nFrom = rows.values.head._2
      assert(ns == nFrom, s"$from: transition counts $ns != n_from $nFrom")
    }
    // Non-degenerate: all 5 from-states present, off-diagonal mass exists.
    assert(got.keys.map(_._1).toSet.size == 5)
    assert(got.keys.exists(k => k._1 != k._2))
  }
}
