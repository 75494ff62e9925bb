package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CdcCuts

/** CdcCuts differential + property checks:
  *
  *  1. The UTF-8-byte-walking native implementation must equal a plain
  *     String.codePointAt reimplementation of the windowed hash on
  *     arbitrary unicode strings (multi-byte, surrogate pairs) — the same
  *     differential contract RollingHashSpec applies to RollingHash31.
  *  2. Chunking is a partition: reassembling the chunks of every corpus
  *     document reproduces the document (boundaries in [w, len), sorted,
  *     distinct).
  *  3. Boundary-locality: editing a PREFIX of the text leaves the cut
  *     positions in the untouched suffix aligned (shifted by the length
  *     delta) once the rolling window re-fills — the re-synchronization
  *     property that motivates CDC over fixed-stride chunking.
  */
class CdcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** Reference: windowed polynomial hash over code points via
    * String.codePointAt (no byte walking, no ring buffer).
    */
  private def refCuts(s: String, w: Int, maskBits: Int): Seq[Long] = {
    val cps = s.codePoints().toArray
    val mask31 = 0x7FFFFFFFL
    val cutMask = (1L << maskBits) - 1
    (w to cps.length).filter { i =>
      val h = (0 until w).foldLeft(0L) { (acc, j) =>
        // Σ cp[i-1-j] · 31^j : newest (j=0) has weight 1.
        (acc + (cps(i - 1 - j).toLong *
          (0 until j).foldLeft(1L)((p, _) => (p * 31L) & mask31))) & mask31
      }
      (h & cutMask) == 0L
    }.map(_.toLong)
  }

  private def nativeCuts(s: String, w: Int, m: Int): Seq[Long] =
    CdcCuts.cuts(org.apache.spark.unsafe.types.UTF8String.fromString(s), w, m)
      .toLongArray().toSeq

  test("native cuts equal the codePointAt reimplementation (unicode fuzz)") {
    // Seeded fuzz (the scalatest/scalacheck bridge is not in the offline
    // cache): 200 random strings mixing ascii with multi-byte and
    // surrogate-pair code points.
    val alphabet = ("abcdefghij XYZ0123".map(_.toString) ++
      Seq("é", "ü", "中", "文", "🎉", "Ω", "ß")).toIndexedSeq
    // stress.sh varies the fuzz seed per trial (fresh 200-string corpus).
    val rnd = new scala.util.Random(7 + SparkTestBase.stressSeed)
    (1 to 200).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(120))(
        alphabet(rnd.nextInt(alphabet.size))).mkString
      assert(nativeCuts(s, 8, 5) == refCuts(s, 8, 5), s"on: $s")
    }
    // Pinned multi-byte / surrogate / boundary cases.
    Seq("", "short", "exactly8chars!!", "中文" * 20, "🎉" * 30,
      "mixed 中文 and ascii text that runs long enough to cut" * 4)
      .foreach { s =>
        assert(nativeCuts(s, 8, 5) == refCuts(s, 8, 5), s"on: $s")
      }
  }

  test("chunks partition every corpus document exactly") {
    import org.apache.spark.sql.functions._
    val df = graft.queries.TextOps.cdcChunks.run(spark, "/root/testdata/sf0.001")
    // Per doc: chunks sorted by start must tile [0, len) with no gaps.
    val rows = df.select("doc_id", "chunk_idx", "start_cp", "chunk_chars")
      .collect().groupBy(_.getLong(0))
    val lens = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), length(col("text")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.size == lens.size)
    rows.foreach { case (doc, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      var pos = 0L
      sorted.foreach { r =>
        assert(r.getLong(2) == pos, s"doc $doc: gap at $pos")
        pos += r.getLong(3)
      }
      assert(pos == lens(doc), s"doc $doc: chunks cover $pos of ${lens(doc)}")
    }
  }

  test("cut positions re-synchronize after a prefix edit") {
    val base = "the quick brown fox jumps over the lazy dog again and again " * 8
    val edited = "INSERTED PREFIX " + base
    val w = 8
    val c1 = nativeCuts(base, w, 5)
    val c2 = nativeCuts(edited, w, 5)
    val delta = "INSERTED PREFIX ".length.toLong
    // Every base cut past the first window after the edit point must
    // reappear shifted by delta (the window only spans w code points, so
    // hashes over the untouched suffix are identical).
    val resync = c1.filter(_ >= w + delta)
    assert(resync.nonEmpty)
    resync.foreach { c =>
      assert(c2.contains(c + delta), s"cut $c did not re-synchronize")
    }
  }
}
