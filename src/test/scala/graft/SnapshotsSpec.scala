package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Snapshots

/** The snapshot-table reader contract: committed versions are immutable
  * and each read resolves to exactly one manifest's files — a half-done
  * publish (orphan data files, manifest without pointer flip) is
  * INVISIBLE, and every historical version stays readable after later
  * publishes (time travel).
  */
class SnapshotsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.01"

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select(col("doc_id")).collect().map(_.getLong(0)).toSet

  test("publish/read round-trip, snapshot isolation, time travel") {
    val table = Files.createTempDirectory("graft_snap").toString
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    val v1 = Snapshots.publish(docs, table)
    assert(v1 == 1)
    assert(ids(Snapshots.read(spark, table)) == ids(docs))

    // v2 rewrites the table as a filtered subset — NOT an append — and
    // the reader must flip to exactly it, while v1 stays readable.
    val subset = docs.filter(col("doc_id") % 2 === 0)
    val v2 = Snapshots.publish(subset, table)
    assert(v2 == 2)
    assert(ids(Snapshots.read(spark, table)) == ids(subset))
    assert(ids(Snapshots.read(spark, table, Some(1))) == ids(docs))
    assert(Snapshots.latestVersion(table) == 2)
  }

  test("a crashed publish is invisible: orphans and uncommitted manifests") {
    val table = Files.createTempDirectory("graft_snap2").toString
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    Snapshots.publish(docs, table)
    val before = ids(Snapshots.read(spark, table))

    // Crash between stage and manifest: orphan data files appear.
    docs.limit(10).write.mode("overwrite").parquet(s"$table/crash_stage")
    Files.list(Paths.get(s"$table/crash_stage")).forEach { p =>
      if (p.getFileName.toString.endsWith(".parquet"))
        Files.move(p, Paths.get(table, "data",
          "v99999-orphan-" + p.getFileName.toString))
    }
    assert(ids(Snapshots.read(spark, table)) == before,
      "orphan data files leaked into the read")

    // Crash between manifest and pointer flip: manifest exists but
    // _latest still names v1 — the default read must not see v2.
    Files.writeString(Paths.get(table, "_manifests", "v00002.json"), "[]")
    assert(Snapshots.latestVersion(table) == 1)
    assert(ids(Snapshots.read(spark, table)) == before,
      "uncommitted manifest leaked into the default read")

    // And the NEXT successful publish commits cleanly over the debris.
    val subset = docs.filter(col("doc_id") < 100)
    val v = Snapshots.publish(subset, table)
    assert(v == 2)
    assert(ids(Snapshots.read(spark, table)) == ids(subset))
  }

  test("append commits reuse prior files; compact preserves rows") {
    val table = Files.createTempDirectory("graft_snap3").toString
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val half1 = docs.filter(col("doc_id") < 250)
    val half2 = docs.filter(col("doc_id") >= 250)
    Snapshots.publish(half1.repartition(4), table)
    val v2 = Snapshots.append(half2.repartition(4), table)
    assert(v2 == 2)
    assert(ids(Snapshots.read(spark, table)) == ids(docs))
    assert(ids(Snapshots.read(spark, table, Some(1))) == ids(half1))
    // Append reuses v1's data files byte-for-byte: v2's manifest must
    // reference v1-prefixed names (immutable-file sharing, the thing
    // that makes appends O(new data) instead of O(table)).
    val m2 = Files.readString(Paths.get(table, "_manifests", "v00002.json"))
    assert(m2.contains("v00001-") && m2.contains("v00002-"))

    // (compaction leg below; streaming exactly-once in its own test)
    // Compaction: same rows, range layout, old version still readable.
    val v3 = Snapshots.compact(spark, table, 2, col("doc_id"))
    assert(v3 == 3)
    assert(ids(Snapshots.read(spark, table)) == ids(docs))
    assert(ids(Snapshots.read(spark, table, Some(2))) == ids(docs))
    val m3 = Files.readString(Paths.get(table, "_manifests", "v00003.json"))
    assert(!m3.contains("v00001-") && !m3.contains("v00002-"),
      "compaction manifest still references pre-compaction files")
    assert(m3.split(",").length == 2, "compaction did not produce 2 files")
  }

  test("vacuum deletes only what no retained manifest references") {
    val table = Files.createTempDirectory("graft_snap6").toString
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // v1 full, v2 = v1's files + appended rows (SHARED files), v3 rewrite.
    Snapshots.publish(docs.filter(col("doc_id") < 250), table)
    Snapshots.append(docs.filter(col("doc_id") >= 250), table)
    Snapshots.publish(docs.filter(col("doc_id") < 100), table)
    // plus a crashed-stage orphan
    docs.limit(5).write.mode("overwrite").parquet(s"$table/stage-vX-crash")
    val v2Rows = ids(Snapshots.read(spark, table, Some(2)))
    val v3Rows = ids(Snapshots.read(spark, table, Some(3)))

    val removed = Snapshots.vacuum(table, retainLast = 2)
    // retained versions byte-identical; expired version fails loudly
    assert(ids(Snapshots.read(spark, table, Some(2))) == v2Rows)
    assert(ids(Snapshots.read(spark, table, Some(3))) == v3Rows)
    intercept[IllegalArgumentException] {
      Snapshots.read(spark, table, Some(1))
    }
    // v1's files SURVIVE (v2's manifest references them — the shared-file
    // allow-list rule), so nothing v1-prefixed was removed...
    assert(!removed.exists(_.startsWith("v00001-")),
      s"vacuum deleted files a retained manifest references: $removed")
    // ...and the crashed stage directory is gone.
    assert(!Files.exists(Paths.get(s"$table/stage-vX-crash")))

    // Retaining only the latest drops v2 and now v1's files DO go.
    val removed2 = Snapshots.vacuum(table, retainLast = 1)
    assert(removed2.exists(_.startsWith("v00001-")))
    assert(ids(Snapshots.read(spark, table)) == v3Rows)
    intercept[IllegalArgumentException] {
      Snapshots.read(spark, table, Some(2))
    }
  }

  test("Z-order compaction commit preserves rows and versions") {
    val table = Files.createTempDirectory("graft_snap7").toString
    // events carry the two keys the z-order census normalizes.
    val ev = graft.queries.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"))
    Snapshots.publish(ev.repartition(8), table)
    val v2 = Snapshots.compactZ(spark, table, 4,
      col("user_id") * 256, col("event_id") % 65536)
    assert(v2 == 2)
    def rows(v: Int): Set[(Long, Long)] =
      Snapshots.read(spark, table, Some(v))
        .select(col("event_id"), col("user_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(2) == rows(1))
    val m2 = Files.readString(Paths.get(table, "_manifests", "v00002.json"))
    assert(m2.split(",").length == 4, "z-compaction did not produce 4 files")
  }

  test("streaming appendBatch is exactly-once under batch replay") {
    // foreachBatch re-runs a batch after failure; the sink's batchId
    // watermark rides in the same atomic rename as the data commit, so a
    // replay is a no-op and an interleaved batch commit can't duplicate.
    val table = Files.createTempDirectory("graft_snap4").toString
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val b0 = docs.filter(col("doc_id") < 100)
    val b1 = docs.filter(col("doc_id") >= 100 && col("doc_id") < 200)

    assert(Snapshots.appendBatch(b0, table, 0L))
    assert(ids(Snapshots.read(spark, table)) == ids(b0))
    // replay of batch 0 after a simulated failure: no-op
    assert(!Snapshots.appendBatch(b0, table, 0L))
    assert(Snapshots.latestVersion(table) == 1)
    assert(Snapshots.appendBatch(b1, table, 1L))
    assert(ids(Snapshots.read(spark, table)) == ids(b0) ++ ids(b1))
    // replay of batch 1 AND a stale batch 0: both no-ops, table unchanged
    assert(!Snapshots.appendBatch(b1, table, 1L))
    assert(!Snapshots.appendBatch(b0, table, 0L))
    assert(Snapshots.latestVersion(table) == 2)
    assert(ids(Snapshots.read(spark, table)) == ids(b0) ++ ids(b1))
    // a non-streaming commit carries the batch watermark forward: the
    // publish below must not reopen batch 1 for replay.
    Snapshots.publish(docs, table)
    assert(Snapshots.lastBatchId(table) == 1L)
    assert(!Snapshots.appendBatch(b1, table, 1L))

    // And the real wiring: drive it from an actual foreachBatch stream.
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val table2 = Files.createTempDirectory("graft_snap5").toString
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    val q = input.toDS().toDF("doc_id")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        Snapshots.appendBatch(b, table2, id); ()
      }
      .start()
    try {
      input.addData(1L, 2L, 3L); q.processAllAvailable()
      input.addData(4L, 5L); q.processAllAvailable()
      val got = Snapshots.read(spark, table2)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      assert(got == Set(1L, 2L, 3L, 4L, 5L))
      assert(Snapshots.latestVersion(table2) == 2)
    } finally q.stop()
  }
}
