package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Gif, Multimodal}

/** The GIF/LZW codec: a hand-derived golden fixture (codes packed to bits
  * by hand, NOT via the encoder), the KwKwK corner case, dictionary resets
  * past 4096 entries, sub-block reassembly, malformed-payload rejection,
  * and the Spark-side determinism leg.
  */
class GifSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  /** Test-local GIF87a container around a raw LZW byte stream —
    * independent of Gif.encode's internals.
    */
  private def container(w: Int, h: Int, lzw: Array[Byte]): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuilder.make[Byte]
    out ++= "GIF87a".getBytes("US-ASCII")
    out += (w & 0xff).toByte; out += ((w >> 8) & 0xff).toByte
    out += (h & 0xff).toByte; out += ((h >> 8) & 0xff).toByte
    out += 0xf7.toByte; out += 0; out += 0
    for (k <- 0 until 256) { out += k.toByte; out += k.toByte; out += k.toByte }
    out += 0x2c
    out ++= Array[Byte](0, 0, 0, 0)
    out += (w & 0xff).toByte; out += ((w >> 8) & 0xff).toByte
    out += (h & 0xff).toByte; out += ((h >> 8) & 0xff).toByte
    out += 0; out += 8
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out += n.toByte
      out ++= lzw.slice(off, off + n)
      off += n
    }
    out += 0; out += 0x3b.toByte
    out.result()
  }

  test("decodes a golden fixture with hand-packed 9-bit LZW codes") {
    // 2x2 image, indices [1,2,1,2]. The LZW code sequence for this stream
    // is Clear(256), 1, 2, 258, EOI(257) — code 258 is the (1,2) entry the
    // encoder defined after emitting '1', exercising a real dictionary hit.
    // Packed LSB-first at 9 bits/code BY HAND:
    //   256=0x100,1,2,258=0x102,257=0x101 → bytes 00 03 08 10 18 10.
    val lzw = Array[Byte](0x00, 0x03, 0x08, 0x10, 0x18, 0x10)
    val s = Gif.decode(container(2, 2, lzw))
    assert(s == Gif.IndexStats(width = 2, height = 2, nPx = 4,
      sumIdx = 1 + 2 + 1 + 2, nColors = 2, topRowSum = 1 + 2))
  }

  test("KwKwK: a run of identical indices round-trips (code == nextCode)") {
    // [1,1,1,1] encodes as Clear, 1, 258, 1, EOI — the decoder receives
    // 258 while its own nextCode is 258 (the entry being defined). A
    // decoder without the KwKwK branch rejects or corrupts this stream.
    for (n <- Seq(2, 3, 4, 7, 100)) {
      val px = Array.fill(n)(1.toByte)
      val s = Gif.decode(Gif.encode(1, n, px))
      assert(s == Gif.IndexStats(1, n, n.toLong, n.toLong, 1, 1L), s"run $n")
    }
  }

  test("round-trips exact stats across geometries, random + repetitive data") {
    val rnd = new scala.util.Random(19 + SparkTestBase.stressSeed)
    val cases = Seq(
      (1, 1, Array[Byte](42)),
      (23, 19, Array.fill(23 * 19)(rnd.nextInt(256).toByte)), // multi-block
      (10, 10, Array.tabulate(100)(i => (i % 3).toByte)),     // dict-heavy
      (16, 5, Array.tabulate(80)(i => (i * 37 % 256).toByte)))
    for ((w, h, px) <- cases) {
      val s = Gif.decode(Gif.encode(w, h, px))
      val idx = px.map(_ & 0xff)
      assert(s.width == w && s.height == h && s.nPx == w.toLong * h)
      assert(s.sumIdx == idx.map(_.toLong).sum)
      assert(s.nColors == idx.distinct.length)
      assert(s.topRowSum == idx.take(w).map(_.toLong).sum)
    }
  }

  test("dictionary reset: >4096 entries forces a mid-stream CLEAR, still exact") {
    // 120x120 of seeded random bytes: ~14k indices assign entries far past
    // 4096, so the encoder emits CLEAR mid-stream and both sides rebuild
    // from a fresh table at 9-bit codes — the full reset path, which the
    // ≤437-px synthesized corpus never reaches.
    val rnd = new scala.util.Random(7 + SparkTestBase.stressSeed)
    val px = Array.fill(120 * 120)(rnd.nextInt(256).toByte)
    val s = Gif.decode(Gif.encode(120, 120, px))
    assert(s.nPx == 14400L)
    assert(s.sumIdx == px.map(p => (p & 0xff).toLong).sum)
    assert(s.topRowSum == px.take(120).map(p => (p & 0xff).toLong).sum)
  }

  test("rejects what it cannot decode (quarantine, not wrong pixels)") {
    val good = Multimodal.syntheticGif("hello world, gif edition".getBytes("UTF-8"))
    assert(Gif.decode(good).nPx > 0)
    val badMagic = good.clone(); badMagic(4) = '9' // GIF89a: out of scope
    intercept[IllegalArgumentException](Gif.decode(badMagic))
    // Non-grayscale palette entry (entry 0 red channel).
    val badPal = good.clone(); badPal(13) = 1
    intercept[IllegalArgumentException](Gif.decode(badPal))
    intercept[IllegalArgumentException](Gif.decode(good.take(800)))
    // Truncate the trailer.
    intercept[IllegalArgumentException](Gif.decode(good.dropRight(1)))
    // A code beyond the table: pack code 300 right after CLEAR (first code
    // after clear must be a literal < 256).
    val lzw = {
      val codes = Seq(256, 300)
      var buf = 0L; var cnt = 0
      val b = scala.collection.mutable.ArrayBuilder.make[Byte]
      codes.foreach { c =>
        buf |= c.toLong << cnt; cnt += 9
        while (cnt >= 8) { b += (buf & 0xff).toByte; buf >>>= 8; cnt -= 8 }
      }
      if (cnt > 0) b += (buf & 0xff).toByte
      b.result()
    }
    intercept[IllegalArgumentException](Gif.decode(container(1, 2, lzw)))
    // Pixel-count mismatch: a valid 4-px stream in a 2x3 container.
    val four = Gif.encode(2, 2, Array[Byte](1, 2, 3, 4))
    val resized = four.clone()
    resized(8) = 3 // screen height 2→3
    resized(6 + 7 + 768 + 8) = 3 // image descriptor height 2→3
    intercept[IllegalArgumentException](Gif.decode(resized))
  }

  test("gifStats is deterministic across partitionings and batch sizes") {
    val a = Multimodal.gifStats(spark, docs, batchSize = 64)
      .collect().sortBy(_.doc_id)
    val b = Multimodal.gifStats(spark, docs.repartition(7), batchSize = 3)
      .collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty)
    val lens = docs.select(col("doc_id"),
      octet_length(col("text")).cast("long").as("len"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    a.foreach { f =>
      val len = lens(f.doc_id)
      assert(f.width == 1 + (len % 23) && f.height == 1 + ((len / 23) % 19))
      assert(f.n_colors >= 1 && f.n_colors <= 256)
    }
  }
}
