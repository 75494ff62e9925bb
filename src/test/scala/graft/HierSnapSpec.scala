package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.sources.Snapshots

/** sim_topk_hier_snap — the hier serving index moved from a process-local
  * partitioned directory to a COMMITTED SNAPSHOT TABLE (VERDICT r11 ask
  * #5). Three laws:
  *
  *  - ROW EQUALITY with the directory-layout form on the real sf0.01
  *    table: the lifecycle changes durability and I/O, never the answer;
  *  - VERSION PINNING: a reader that resolved version v keeps reading
  *    exactly v's complete content under a concurrent transactional
  *    rebuild — no torn candidate set, no half-built index, because the
  *    rebuild is invisible until its single manifest CAS (this is the
  *    property the raw-TempDir layout carried only via the TempDirs
  *    drain-hook race fix; the table carries it by construction);
  *  - DRAIN RECOVERY: after TempDirs.drain() deletes the cached table,
  *    the serving query rebuilds and re-commits a fresh index
  *    transparently (the cache-revalidation discipline shared with the
  *    directory layouts).
  */
class HierSnapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.01"

  test("snapshot-served result equals the directory-layout form (sf0.01)") {
    val snap = Similarity.hierSnapTopk(spark, sfDir, batch = 20, nprobe = 2)
      .collect().map(_.toSeq).toSet
    val pruned = Similarity.hierPrunedTopk(spark, sfDir, batch = 20, nprobe = 2)
      .collect().map(_.toSeq).toSet
    assert(snap.nonEmpty, "empty snapshot-served result")
    assert(snap == pruned,
      s"${(snap -- pruned).size} extra, ${(pruned -- snap).size} missing " +
        s"of ${pruned.size}")
  }

  test("a pinned version serves immutably under a transactional rebuild") {
    val table = Similarity.hierSnapIndexTable(spark, sfDir)
    val v0 = Snapshots.latestVersion(table)
    // The lifecycle committed at least twice: publish (build) + compact
    // (cell-clustered OPTIMIZE).
    assert(v0 >= 2, s"expected publish+compact commits, latest is v$v0")
    val before = Snapshots.read(spark, table, Some(v0)).count()
    assert(before > 0)

    // Transactional REBUILD: a new full-frame commit. Until its one
    // manifest CAS lands, no reader can observe it; after it lands, v0
    // is still byte-identical time travel.
    val v1 = Snapshots.publish(Snapshots.read(spark, table, Some(v0)), table)
    assert(v1 == v0 + 1, s"rebuild must be exactly one commit, got v$v1")
    assert(Snapshots.read(spark, table, Some(v0)).count() == before,
      "the pinned pre-rebuild version changed under the reader")

    // The serving query re-resolves the new latest committed version and
    // (content-identical rebuild) answers identically.
    val out = Similarity.hierSnapTopk(spark, sfDir, batch = 20, nprobe = 2)
      .collect()
    assert(out.nonEmpty)
  }

  test("the per-cell serving read PRUNES FILES through the snapshot " +
      "layer's footer stats") {
    // The I/O-sublinearity half of the lifecycle claim: serving a probed
    // cell must open only the files whose footer [min,max] on `cell`
    // admits it — the compact-on-cell OPTIMIZE commit exists exactly so
    // these ranges are disjoint. Dropped must be the BULK of the layout
    // for a single cell, not zero.
    val table = Similarity.hierSnapIndexTable(spark, sfDir)
    // Pin the check to a version PRODUCED BY compact-on-cell: the
    // preceding test's rebuild commit is an uncompacted publish, so
    // `latestVersion` there only satisfies the disjoint-range premise
    // by accident of file packing (a test-order coupling). Re-compacting
    // here makes the premise guaranteed, whatever ran before.
    val ver = Snapshots.compact(spark, table, 16,
      org.apache.spark.sql.functions.col("cell"))
    val someCell = Snapshots.read(spark, table, Some(ver))
      .select(org.apache.spark.sql.functions.col("cell"))
      .head().getLong(0)
    val (keep, dropped) =
      Snapshots.pruneFilesMulti(table, Seq(("cell", someCell, someCell)),
        Some(ver))
    assert(keep.nonEmpty, "pruning must keep the cell's file(s)")
    // The SCALE-INVARIANT law: on a layout range-clustered by cell, a
    // point range opens at most the two files whose ranges straddle the
    // cell's boundary — however many files the layout has. (At this SF
    // the compact produced few files, so a most-of-the-layout assertion
    // would be vacuous; the <= 2 bound is the one that still means
    // something at 10,000 files.)
    assert(keep.size <= 2,
      s"a one-cell read opened ${keep.size} files — the layout is not " +
        "cell-clustered")
    assert(dropped.nonEmpty,
      s"pruning dropped nothing (kept ${keep.size} of " +
        s"${keep.size + dropped.size})")
  }

  test("vacuum racing a pinned long-lived reader: retained pins read " +
      "byte-identically, expired pins fail loudly — never partially") {
    // The serving-lifecycle gap between "snapshot table" and "production
    // serving story": a fleet holds a version pin ACROSS requests while
    // maintenance (rebuild + vacuum) runs. The retention contract must
    // hold for a reader that resolved its file list BEFORE the vacuum:
    //  - pin within retention  -> completes with identical rows;
    //  - pin expired           -> fails LOUDLY (manifest gone for fresh
    //    resolution, files gone for the in-flight plan), and NEVER
    //    yields a partial/half-vacuumed result.
    val table = Similarity.hierSnapIndexTable(spark, sfDir)
    val vPin = Snapshots.latestVersion(table)
    // Long-lived reader: resolves vPin's manifest and file list NOW.
    val pinned = Snapshots.read(spark, table, Some(vPin))
    val baseline = pinned.collect().map(_.toSeq).toSet
    assert(baseline.nonEmpty)
    // Maintenance: a rebuild commit (new data files), then a vacuum that
    // RETAINS the pin. The in-flight reader must be untouched — vacuum's
    // allow-list keeps every file a retained manifest references.
    Snapshots.publish(Snapshots.read(spark, table, Some(vPin)), table)
    Snapshots.vacuum(table, retainLast = 2)
    assert(pinned.collect().map(_.toSeq).toSet == baseline,
      "a RETAINED pinned version changed under vacuum")
    // Maintenance tightens retention past the pin. A fresh resolution of
    // vPin must fail at manifest resolution (loud, immediate)...
    Snapshots.vacuum(table, retainLast = 1)
    intercept[Exception] {
      Snapshots.read(spark, table, Some(vPin)).count()
    }
    // ...and the in-flight plan must either fail loudly on its deleted
    // files or (had the files been shared with the retained version)
    // return the COMPLETE baseline — any partial result is a contract
    // violation worse than either.
    scala.util.Try(pinned.collect().map(_.toSeq).toSet) match {
      case scala.util.Success(rows) =>
        assert(rows == baseline,
          s"expired pin read PARTIALLY: ${rows.size} of ${baseline.size} rows")
      case scala.util.Failure(_) => // loud, per contract
    }
    // The serving path itself is unaffected: it re-resolves latest.
    assert(Similarity.hierSnapTopk(spark, sfDir, batch = 20, nprobe = 2)
      .collect().nonEmpty)
  }

  test("after TempDirs.drain() the serving query rebuilds a fresh " +
      "committed index") {
    graft.TempDirs.drain()
    val out = Similarity.hierSnapTopk(spark, sfDir, batch = 20, nprobe = 2)
      .collect()
    assert(out.nonEmpty, "serving did not recover from a drained index")
  }
}
