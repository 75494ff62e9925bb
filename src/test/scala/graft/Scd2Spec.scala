package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** q_events_scd2 differential + the SCD2 invariants: the windowed
  * change-detection build must equal a sequential per-user fold, and the
  * version set must satisfy the dimension-table contract — intervals
  * tile the user's timeline with no gap or overlap, exactly one current
  * version per user, consecutive versions actually differ, and the
  * covered event counts conserve the user's event total.
  */
class Scd2Spec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.01"

  test("history equals the sequential fold and the SCD2 invariants hold") {
    val events = graft.queries.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").cast("double"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3)))

    val want = events.groupBy(_._1).flatMap { case (uid, evs) =>
      val sorted = evs.sortBy(e => (e._4, e._2))
      // Sequential fold: new version on type change.
      val versions = scala.collection.mutable.ArrayBuffer
        .empty[(String, Double, Long)] // (type, from, count)
      for ((_, _, typ, tsd) <- sorted) {
        if (versions.isEmpty || versions.last._1 != typ)
          versions += ((typ, tsd, 1L))
        else {
          val l = versions.last
          versions(versions.length - 1) = (l._1, l._2, l._3 + 1)
        }
      }
      versions.zipWithIndex.map { case ((typ, from, n), i) =>
        val to = if (i + 1 < versions.length) Some(versions(i + 1)._2) else None
        (uid, (i + 1).toLong) -> ((typ, from, to, n, to.isEmpty))
      }
    }

    val got = SparkEntry.queries("q_events_scd2")(spark, dir)
      .collect().map { r =>
        val to = if (r.isNullAt(4)) None else Some(r.getDouble(4))
        (r.getLong(0), r.getLong(1)) ->
          ((r.getString(2), r.getDouble(3), to, r.getLong(5), r.getBoolean(6)))
      }.toMap
    assert(got.keySet == want.keySet)
    val bad = got.collect { case (k, v) if want(k) != v => (k, v, want(k)) }
    assert(bad.isEmpty, s"SCD2 mismatches (got vs want): ${bad.take(3)}")

    // Invariants, stated on the produced frame itself:
    got.groupBy(_._1._1).foreach { case (uid, vs) =>
      val ordered = vs.toSeq.sortBy(_._1._2).map(_._2)
      // exactly one current, and it is the last version
      assert(ordered.count(_._5) == 1, s"user $uid: currents != 1")
      assert(ordered.last._5, s"user $uid: current is not the last version")
      // tiling: valid_to == next valid_from; strictly increasing
      ordered.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._3.contains(b._2), s"user $uid: interval gap/overlap")
          assert(a._2 < b._2, s"user $uid: non-increasing versions")
        case _ =>
      }
      // consecutive versions differ in type (change detection is real)
      ordered.sliding(2).foreach {
        case Seq(a, b) => assert(a._1 != b._1, s"user $uid: no-op version")
        case _ =>
      }
    }
    // conservation: version event counts sum to the user's event total
    val perUserGot = got.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2._4).sum).toMap
    val perUserWant = events.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    assert(perUserGot == perUserWant, "event counts not conserved")
    // non-degenerate: multi-version users exist
    assert(got.keys.exists(_._2 > 1), "no user ever changed type")
  }
}
