package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.state._

/** The RSM's live-server face: per-group GroupState holds the Snapshot()
  * BYTES, so every micro-batch is Restore → apply slab → Snapshot. Pins the
  * cross-batch properties the byte image must carry: versions continue, and
  * a resend arriving in a LATER micro-batch than its original is still
  * suppressed (the session table rode inside the bytes).
  */
class RsmStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def row(grp: Long, idx: Long, client: Long, seq: Long,
      ver: Long): RsmKvLogRow =
    RsmKvLogRow(grp, idx, client, seq, s"k$client", s"v$client-$seq", ver)

  test("streamed slabs equal one batch replay; cross-batch resend suppressed") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[RsmKvLogRow]
    val q = RsmStream.pipeline(spark, input.toDS())
      .writeStream.format("memory").queryName("rsmout")
      .outputMode("update").start()
    try {
      // Batch 1: two groups, three clients; client 2's entry at idx 11 will
      // be re-committed in batch 2.
      val b1 = Seq(row(0, 10, 1, 0, 0), row(0, 11, 2, 0, 0),
        row(1, 20, 3, 0, 0), row(0, 12, 1, 1, 1))
      input.addData(b1: _*)
      q.processAllAvailable()
      val p1 = spark.table("rsmout").as[RsmGroupProgress].collect()
        .groupBy(_.grp).map { case (g, rs) => g -> rs.last }
      assert(p1(0L).nApplied == 3 && p1(0L).nSuppressed == 0)
      assert(p1(1L).nKeys == 1 && p1(1L).versionSum == 1)

      // Batch 2: the RESEND of (client 2, seq 0) — committed again at a
      // later index — plus fresh entries continuing each client's sequence.
      val b2 = Seq(row(0, 13, 2, 0, 0), // resend: must be suppressed
        row(0, 14, 2, 1, 1), row(1, 21, 3, 1, 1))
      input.addData(b2: _*)
      q.processAllAvailable()
      // Memory-sink row order across batches isn't guaranteed: the latest
      // emission per group is the one with the most entries accounted.
      val p2 = spark.table("rsmout").as[RsmGroupProgress].collect()
        .groupBy(_.grp).map { case (g, rs) =>
          g -> rs.maxBy(p => p.nApplied + p.nSuppressed)
        }
      // Ground truth: one sequential replay of the full per-group logs.
      val full = (b1 ++ b2).groupBy(_.grp).map { case (g, rows) =>
        g -> Rsm.replay(KvRsmMachine, Rsm.start(KvRsmMachine),
          rows.sortBy(_.index).iterator.map(r =>
            RsmEntry(r.index, r.clientId, r.seq,
              KvOp(r.key, r.value, r.version, seq = r.index))))
      }
      for ((g, img) <- full) {
        val p = p2(g)
        assert(p.nApplied == img.nApplied, s"grp $g nApplied")
        assert(p.nSuppressed == img.nSuppressed, s"grp $g nSuppressed")
        assert(p.nKeys == img.state.size.toLong, s"grp $g nKeys")
        assert(p.versionSum == img.state.valuesIterator.map(_.version).sum,
          s"grp $g versionSum")
      }
      assert(p2(0L).nSuppressed == 1, "cross-batch resend was not suppressed")
      // Versions continued across the byte snapshot: client 1 and 2 each
      // reached version 2 in grp 0, so versionSum = 4.
      assert(p2(0L).versionSum == 4)
    } finally q.stop()
  }
}
