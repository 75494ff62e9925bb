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

  test("after TempDirs.drain() the serving query rebuilds a fresh " +
      "committed index") {
    graft.TempDirs.drain()
    val out = Similarity.hierSnapTopk(spark, sfDir, batch = 20, nprobe = 2)
      .collect()
    assert(out.nonEmpty, "serving did not recover from a drained index")
  }
}
