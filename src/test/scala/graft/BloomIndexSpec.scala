package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, md5}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Snapshots

/** Bloom-filter point-read index on the snapshot table. Laws:
  *  - addBloomIndex is a metadata-only versioned property; files written
  *    AFTER it carry real parquet row-group bloom filters, files written
  *    before stay conservatively kept (no false skips, ever);
  *  - a rewrite commit (compact/optimize) MATERIALIZES filters for the
  *    files it rewrites — layout maintenance doubles as index build;
  *  - pruneFilesBloom keeps every file that holds the value (the bloom
  *    no-false-negative guarantee) and actually skips on a
  *    high-cardinality unclustered digest column — the case where
  *    min/max stats can prove nothing;
  *  - readPoint is row-identical to the full-scan equality filter, on
  *    string and long probes, with deletion vectors applied.
  */
class BloomIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.01"

  // digest = md5(text): high-cardinality, UNCLUSTERED relative to the
  // doc_id range layout — every file spans the whole digest range, so
  // min/max stats keep everything and only a bloom can skip.
  private def docs = spark.read.parquet(s"$dir/documents.parquet")
    .select(col("doc_id"), col("lang"), col("n_chars"),
      md5(col("text").cast("binary")).as("digest"))

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.select(col("doc_id"), col("digest")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("pre-index files are conservatively kept; compact materializes " +
      "filters; the bloom then skips most files on a digest point read") {
    val table = Files.createTempDirectory("graft_bloom1").toString
    Snapshots.publish(docs.repartitionByRange(8, col("doc_id")), table) // v1
    val probe = docs.filter(col("doc_id") === 42L)
      .select(col("digest")).first().getString(0)

    // No index: nothing can be proven, everything kept.
    val (keep0, skip0) = Snapshots.pruneFilesBloom(table, "digest", probe)
    assert(skip0.isEmpty && keep0.size == 8,
      "files without filters must be conservatively kept")

    Snapshots.addBloomIndex(table, "digest")                            // v2
    // Metadata-only: same file list, still no filters to test.
    val (_, skip1) = Snapshots.pruneFilesBloom(table, "digest", probe)
    assert(skip1.isEmpty, "addBloomIndex must not skip pre-index files")

    Snapshots.compact(spark, table, 8, col("doc_id"))                   // v3
    val (keep2, skip2) = Snapshots.pruneFilesBloom(table, "digest", probe)
    assert(skip2.nonEmpty,
      "rewritten files carry filters; a digest probe must skip some")
    // The no-false-negative law, via row equality on the kept subset.
    val expect = rows(Snapshots.read(spark, table)
      .filter(col("digest") === probe))
    assert(expect.nonEmpty)
    assert(rows(Snapshots.readPoint(spark, table, "digest", probe)) == expect)
    assert(keep2.size + skip2.size == 8)

    // A value NOT in the table reads empty (whatever the skip count).
    assert(Snapshots.readPoint(spark, table, "digest",
      "00000000000000000000000000000000").count() == 0)
  }

  test("long-typed probe, DV interplay, and drop semantics") {
    val table = Files.createTempDirectory("graft_bloom2").toString
    Snapshots.publish(docs.repartitionByRange(8, col("doc_id")), table) // v1
    Snapshots.addBloomIndex(table, "doc_id")                            // v2
    Snapshots.optimize(spark, table, 8L * 1024 * 1024)                  // v3
    val expect = rows(Snapshots.read(spark, table)
      .filter(col("doc_id") === 123L))
    assert(rows(Snapshots.readPoint(spark, table, "doc_id", 123L)) == expect)

    // A DV delete masks the row; the bloom still keeps its file (filters
    // are immutable with the file) but the read applies the vectors.
    Snapshots.deleteWhereDV(spark, table, col("doc_id") === 123L)       // v4
    assert(Snapshots.readPoint(spark, table, "doc_id", 123L).count() == 0,
      "a DV-masked row must not resurface through the point read")

    // Drop is metadata-only and loud on unknown columns.
    Snapshots.dropBloomIndex(table, "doc_id")                           // v5
    intercept[IllegalArgumentException] {
      Snapshots.dropBloomIndex(table, "doc_id")
    }
    // Existing filters stay usable after the drop (they ride in files).
    assert(Snapshots.readPoint(spark, table, "doc_id", 124L).count() ==
      Snapshots.read(spark, table).filter(col("doc_id") === 124L).count())
  }

  test("merge on a bloom-indexed key narrows findTouchedFiles to filter " +
      "bytes and stays row-exact") {
    val table = Files.createTempDirectory("graft_bloom4").toString
    Snapshots.publish(docs.repartitionByRange(8, col("doc_id")), table) // v1
    Snapshots.addBloomIndex(table, "doc_id")                            // v2
    Snapshots.compact(spark, table, 8, col("doc_id"))                   // v3

    // The narrowing is observable directly: a 3-key delta's candidate
    // files come from pruneFilesBloomAny, which must skip most of the 8
    // range-clustered files (the keys live in at most 3).
    val deltaKeys = Seq[Any](5L, 6L, 300L)
    val (cand, skipped) =
      Snapshots.pruneFilesBloomAny(table, "doc_id", deltaKeys)
    assert(skipped.size >= 5,
      s"3 keys across 8 clustered files must skip most: kept ${cand.size}")

    // And the merge itself stays exactly the upsert semantics: updates
    // replace, inserts land, everything else is untouched.
    val delta = docs.filter(col("doc_id").isin(5L, 6L))
      .select(col("doc_id"), col("lang"), (col("n_chars") + 7L).as("n_chars"),
        col("digest"))
      .unionByName(docs.filter(col("doc_id") === 1L)
        .select((col("doc_id") + 900000L).as("doc_id"), col("lang"),
          col("n_chars"), col("digest")))
    Snapshots.merge(spark, table, delta, "doc_id")                      // v4
    val got = Snapshots.read(spark, table)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = docs.select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = base ++ Map(5L -> (base(5L) + 7L), 6L -> (base(6L) + 7L),
      900001L -> base(1L))
    assert(got == want, "bloom-narrowed merge drifted from upsert semantics")
  }

  test("appends after the index carry filters; time travel sees each " +
      "version's property") {
    val table = Files.createTempDirectory("graft_bloom3").toString
    Snapshots.publish(docs.filter(col("doc_id") < 300)
      .repartitionByRange(4, col("doc_id")), table)                     // v1
    Snapshots.addBloomIndex(table, "digest")                            // v2
    val extra = docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
    Snapshots.append(extra.repartition(2), table)                       // v3

    val probe = docs.filter(col("doc_id") === 350L)
      .select(col("digest")).first().getString(0)
    val (keep, skip) = Snapshots.pruneFilesBloom(table, "digest", probe)
    // The 4 pre-index files are kept conservatively; of the 2 appended
    // (filtered) files, at least one must be skippable for a digest
    // that lives in the other.
    assert(skip.nonEmpty, "appended files must carry usable filters")
    assert(rows(Snapshots.readPoint(spark, table, "digest", probe)) ==
      rows(Snapshots.read(spark, table).filter(col("digest") === probe)))

    // The property is versioned: v1 had no bloom columns.
    assert(Snapshots.bloomColumnsFor(table, 1).isEmpty)
    assert(Snapshots.bloomColumnsFor(table, 3) == Seq("digest"))
  }
}
