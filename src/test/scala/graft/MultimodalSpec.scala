package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Avi, Bmp, Multimodal, Png, Wav}

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  test("payload bytes and meta struct are consistent with the source") {
    val row = Multimodal.withPayload(docs)
      .select(col("doc_id"), length(col("payload")).as("pl"),
        col("meta.n_bytes"), col("meta.mime"))
      .collect()
    assert(row.nonEmpty)
    row.foreach(r => assert(r.getInt(1).toLong == r.getLong(2)))
    assert(row.forall(_.getString(3) == "image/fake"))
  }

  test("feature extraction is deterministic across partitionings") {
    val a = Multimodal.extractFeatures(spark, docs, batchSize = 64)
      .collect().sortBy(_.doc_id)
    val b = Multimodal.extractFeatures(spark, docs.repartition(7), batchSize = 3)
      .collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
    // ASCII corpus: byte length == char count; mean byte in letter range.
    a.foreach { f =>
      assert(f.channels == 3 && f.n_bytes > 0)
      assert(f.mean_byte > 32 && f.mean_byte < 127)
    }
  }

  test("Bmp decodes a hand-built golden fixture exactly") {
    // 2x2 24-bit BMP crafted byte-by-byte (NOT via the encoder): stride is
    // ((3*2+3)/4)*4 = 8, so each row carries 2 padding bytes — set to
    // nonzero garbage to prove the decoder skips them. Rows are stored
    // bottom-up: file row 0 is IMAGE row 1.
    def le(v: Int, n: Int): Seq[Byte] =
      (0 until n).map(i => ((v >>> (8 * i)) & 0xff).toByte)
    val header: Seq[Byte] =
      Seq[Byte]('B', 'M') ++ le(70, 4) ++ le(0, 4) ++ le(54, 4) ++
        le(40, 4) ++ le(2, 4) ++ le(2, 4) ++ le(1, 2) ++ le(24, 2) ++
        le(0, 4) ++ le(16, 4) ++ le(0, 4) ++ le(0, 4) ++ le(0, 4) ++ le(0, 4)
    val bottomRow = Seq[Byte](10, 20, 30, 40, 50, 60) ++
      Seq(0xAA.toByte, 0xBB.toByte) // padding: must be ignored
    val topRow = Seq[Byte](1, 2, 3, 4, 5, 6) ++
      Seq(0xCC.toByte, 0xDD.toByte)
    val bytes = (header ++ bottomRow ++ topRow).toArray
    assert(bytes.length == 70)
    val s = Bmp.decode(bytes)
    assert(s == Bmp.PixelStats(width = 2, height = 2, nPx = 4,
      sumB = 10 + 40 + 1 + 4, sumG = 20 + 50 + 2 + 5, sumR = 30 + 60 + 3 + 6,
      topRowSum = 1 + 2 + 3 + 4 + 5 + 6))
  }

  test("Bmp rejects what it cannot decode (quarantine, not wrong features)") {
    val good = Multimodal.syntheticBmp("hello world".getBytes("UTF-8"))
    assert(Bmp.decode(good).nPx > 0)
    val badMagic = good.clone(); badMagic(0) = 'X'
    intercept[IllegalArgumentException](Bmp.decode(badMagic))
    val badBpp = good.clone(); badBpp(28) = 32
    intercept[IllegalArgumentException](Bmp.decode(badBpp))
    intercept[IllegalArgumentException](Bmp.decode(good.take(60)))
    // A corrupt pixel-data offset pointing inside the headers must reject
    // loudly, not read header bytes as pixels.
    val badOff = good.clone()
    badOff(10) = 0; badOff(11) = 0; badOff(12) = 0; badOff(13) = 0
    intercept[IllegalArgumentException](Bmp.decode(badOff))
  }

  test("Bmp encode/decode round-trips exact channel sums (both stride cases)") {
    // w=1 => stride 4 (1 px + 1 pad byte); w=4 => stride 12 (no padding).
    for ((w, h) <- Seq((1, 3), (4, 2), (31, 17))) {
      val px = Array.tabulate(3 * w * h)(i => ((i * 37 + 11) % 256).toByte)
      val s = Bmp.decode(Bmp.encode(w, h, px))
      def sum(c: Int) = (0 until w * h).map(k => px(3 * k + c) & 0xff).sum.toLong
      assert(s.width == w && s.height == h && s.nPx == w.toLong * h)
      assert((s.sumB, s.sumG, s.sumR) == ((sum(0), sum(1), sum(2))))
      assert(s.topRowSum == (0 until 3 * w).map(i => px(i) & 0xff).sum.toLong)
    }
  }

  test("phash16 sets image-space bits (orientation) and matches the closed form") {
    // Orientation pin: a 4x4 image bright in IMAGE rows 0-1, dark in rows
    // 2-3. Bits 0-7 (top two grid rows) must be set, 8-15 clear — a
    // decoder that forgets to undo the bottom-up file order produces the
    // vertical mirror 0xFF00 instead.
    val px = Array.tabulate(3 * 4 * 4) { i =>
      val y = (i / 3) / 4
      (if (y < 2) 200 else 10).toByte
    }
    assert(Bmp.phash16(Bmp.encode(4, 4, px)) == 0x00FF)
    // Differential: the synthetic path must match an independent closed-
    // form reimplementation (the same formula the DuckDB oracle runs).
    val texts = Seq("hello world", "a", "the quick brown fox jumps over",
      "x" * 100, ("abc " * 200).trim)
    texts.foreach { t =>
      val b = t.getBytes("UTF-8")
      val len = b.length
      val w = 1 + len % 31
      val h = 1 + (len / 31) % 17
      val bs = new Array[Long](16); val bn = new Array[Long](16)
      for (k <- 0 until w * h) {
        val lum = (b(3 * k % len) & 0xff) + (b((3 * k + 1) % len) & 0xff) +
          (b((3 * k + 2) % len) & 0xff)
        val blk = (k % w) * 4 / w + 4 * ((k / w) * 4 / h)
        bs(blk) += lum; bn(blk) += 1
      }
      val (ts, tn) = (bs.sum, bn.sum)
      val want = (0 until 16).map(i =>
        if (bs(i) * tn > ts * bn(i)) 1 << i else 0).sum
      assert(Bmp.phash16(Multimodal.syntheticBmp(b)) == want, s"text '$t'")
    }
  }

  test("phash64 generalizes the grid: closed form + phash16 consistency") {
    // Differential against an independent closed-form reimplementation
    // (the same formula the mm_phash_hamming oracle runs in DuckDB).
    val texts = Seq("hello world", "a", "the quick brown fox jumps over",
      "x" * 100, ("abc " * 200).trim, "z" * 311)
    texts.foreach { t =>
      val b = t.getBytes("UTF-8")
      val len = b.length
      val w = 1 + len % 31
      val h = 1 + (len / 31) % 17
      val bs = new Array[Long](64); val bn = new Array[Long](64)
      for (k <- 0 until w * h) {
        val lum = (b(3 * k % len) & 0xff) + (b((3 * k + 1) % len) & 0xff) +
          (b((3 * k + 2) % len) & 0xff)
        val blk = (k % w) * 8 / w + 8 * ((k / w) * 8 / h)
        bs(blk) += lum; bn(blk) += 1
      }
      val (ts, tn) = (bs.sum, bn.sum)
      var want = 0L
      for (i <- 0 until 64)
        if (bs(i) * tn > ts * bn(i)) want |= 1L << i
      assert(Bmp.phash64(Multimodal.syntheticBmp(b)) == want, s"text '$t'")
    }
  }

  test("planted visual near-dups: Hamming tracks cell edits, pigeonhole catches them") {
    // 64x64 image, 8x8 px per hash cell, cells strongly bright (lum 600)
    // or dark (lum 90) in a fixed pattern — margins so wide that flipping
    // k cells shifts the global mean by ~k*8 lum (<< the ~250 margin) and
    // flips EXACTLY those k bits. The codec-level recall claim behind
    // mm_phash_hamming: a small visual edit is a small Hamming distance.
    val dim = 64
    def img(brightCells: Set[Int]): Array[Byte] = {
      val px = new Array[Byte](3 * dim * dim)
      for (y <- 0 until dim; x <- 0 until dim) {
        val cell = (y / 8) * 8 + (x / 8)
        val v: Byte = if (brightCells(cell)) 200.toByte else 30.toByte
        px(3 * (y * dim + x)) = v
        px(3 * (y * dim + x) + 1) = v
        px(3 * (y * dim + x) + 2) = v
      }
      px
    }
    val base = (0 until 64).filter(c => (c * 37 + 13) % 64 < 32).toSet
    assert(base.size >= 24 && base.size <= 40) // balanced light/dark layout
    val h0 = Bmp.phash64(Bmp.encode(dim, dim, img(base)))
    for (k <- 1 to 3) {
      val edits = (0 until 64).filterNot(base).take(k).toSet
      val hk = Bmp.phash64(Bmp.encode(dim, dim, img(base ++ edits)))
      assert(java.lang.Long.bitCount(h0 ^ hk) == k, s"edit of $k cells")
      // The pigeonhole's pledge at Hamming<=3: >=1 of the 4 16-bit chunks
      // agrees exactly, so the pair lands in a shared bucket.
      assert((0 until 4).exists(c =>
        ((h0 >> (16 * c)) & 0xffffL) == ((hk >> (16 * c)) & 0xffffL)))
    }
    // A genuinely different layout is FAR (no false near-dup): invert all.
    val inv = Bmp.phash64(Bmp.encode(dim, dim, img((0 until 64).toSet -- base)))
    assert(java.lang.Long.bitCount(h0 ^ inv) > 32)
  }

  // ---- PNG: test-local chunk builder, independent of Png's internals ----
  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    def be(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    val t = typ.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32
    crc.update(t); crc.update(data)
    be(data.length) ++ t ++ data ++ be(crc.getValue.toInt)
  }
  private val pngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n',
    0x1a, '\n')
  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length + 64)
    var n = 0
    while (!d.finished()) n += d.deflate(buf, n, buf.length - n)
    d.end(); buf.take(n)
  }

  test("Png decodes a golden fixture with hand-derived deltas for all 5 filters") {
    // 2x5 RGB image; row y carries filter type y. The filtered scanline
    // bytes below were derived BY HAND from RFC 2083 §6 (Sub subtracts the
    // left pixel's same channel, Average floors (left+up)/2, Paeth picks
    // the neighbor closest to left+up-upleft, ties left-first) — a decoder
    // whose reconstruction disagrees with the spec on any filter produces
    // different pixel sums.
    // Raw pixels (RGB): row0 (10,20,30)(40,50,60)   row1 (15,25,35)(45,55,65)
    //                   row2 (20,30,40)(50,60,70)   row3 (25,35,45)(55,65,75)
    //                   row4 (30,40,50)(60,70,80)
    val scanlines = Array[Byte](
      0, 10, 20, 30, 40, 50, 60, // None: raw
      1, 15, 25, 35, 30, 30, 30, // Sub: second px minus first
      2, 5, 5, 5, 5, 5, 5,       // Up: constant +5 vs row1
      3, 15, 20, 25, 18, 18, 18, // Average: floor((left+up)/2) preds
      4, 5, 5, 5, 5, 5, 5)       // Paeth: picks 'up' everywhere here
    val ihdr = Array[Byte](0, 0, 0, 2, 0, 0, 0, 5, 8, 2, 0, 0, 0)
    val z = deflate(scanlines)
    // Split IDAT mid-stream: reassembly is part of the golden contract.
    val bytes = pngSig ++ pngChunk("IHDR", ihdr) ++
      pngChunk("IDAT", z.take(3)) ++ pngChunk("IDAT", z.drop(3)) ++
      pngChunk("IEND", Array.emptyByteArray)
    val s = Png.decode(bytes)
    assert(s == Bmp.PixelStats(width = 2, height = 5, nPx = 10,
      sumB = 30 + 60 + 35 + 65 + 40 + 70 + 45 + 75 + 50 + 80,
      sumG = 20 + 50 + 25 + 55 + 30 + 60 + 35 + 65 + 40 + 70,
      sumR = 10 + 40 + 15 + 45 + 20 + 50 + 25 + 55 + 30 + 60,
      topRowSum = 10 + 20 + 30 + 40 + 50 + 60))
  }

  test("Png rejects what it cannot decode (CRC, geometry, filters, zlib)") {
    val good = Multimodal.syntheticPng("hello world, png edition".getBytes("UTF-8"))
    assert(Png.decode(good).nPx > 0)
    val badSig = good.clone(); badSig(0) = 'X'
    intercept[IllegalArgumentException](Png.decode(badSig))
    // Flip one byte inside the first IDAT payload: CRC must catch it.
    val flipped = good.clone(); flipped(8 + 25 + 8 + 2) =
      (flipped(8 + 25 + 8 + 2) ^ 0x40).toByte
    intercept[IllegalArgumentException](Png.decode(flipped))
    intercept[IllegalArgumentException](Png.decode(good.take(40)))
    // RGBA color type (correct CRC, so the type check itself must fire).
    val ihdrRgba = Array[Byte](0, 0, 0, 2, 0, 0, 0, 2, 8, 6, 0, 0, 0)
    val rgba = pngSig ++ pngChunk("IHDR", ihdrRgba) ++
      pngChunk("IDAT", deflate(new Array[Byte](2 * 9))) ++
      pngChunk("IEND", Array.emptyByteArray)
    intercept[IllegalArgumentException](Png.decode(rgba))
    // Filter type 5 in an otherwise valid file.
    val raw = Array[Byte](5, 1, 2, 3) // 1x1 image, bogus filter byte
    val bad = pngSig ++
      pngChunk("IHDR", Array[Byte](0, 0, 0, 1, 0, 0, 0, 1, 8, 2, 0, 0, 0)) ++
      pngChunk("IDAT", deflate(raw)) ++ pngChunk("IEND", Array.emptyByteArray)
    intercept[IllegalArgumentException](Png.decode(bad))
    // Truncated zlib stream (valid chunks, short data).
    val short = pngSig ++
      pngChunk("IHDR", Array[Byte](0, 0, 0, 1, 0, 0, 0, 1, 8, 2, 0, 0, 0)) ++
      pngChunk("IDAT", deflate(Array[Byte](0, 1, 2, 3)).dropRight(4)) ++
      pngChunk("IEND", Array.emptyByteArray)
    intercept[IllegalArgumentException](Png.decode(short))
  }

  test("Png encode/decode round-trips exact channel sums across geometries") {
    for ((w, h) <- Seq((1, 5), (2, 7), (29, 17), (13, 6))) {
      val px = Array.tabulate(3 * w * h)(i => ((i * 41 + 7) % 256).toByte)
      val s = Png.decode(Png.encode(w, h, px))
      def sum(c: Int) = (0 until w * h).map(k => px(3 * k + c) & 0xff).sum.toLong
      assert(s.width == w && s.height == h && s.nPx == w.toLong * h)
      // PNG is RGB: channel 0 is R (the BMP decoder's channel 0 is B).
      assert((s.sumR, s.sumG, s.sumB) == ((sum(0), sum(1), sum(2))))
      assert(s.topRowSum == (0 until 3 * w).map(i => px(i) & 0xff).sum.toLong)
    }
  }

  test("pngStats is deterministic across partitionings and batch sizes") {
    val a = Multimodal.pngStats(spark, docs, batchSize = 64)
      .collect().sortBy(_.doc_id)
    val b = Multimodal.pngStats(spark, docs.repartition(7), batchSize = 3)
      .collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty)
    val lens = docs.select(col("doc_id"),
      octet_length(col("text")).cast("long").as("len"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    a.foreach { f =>
      val len = lens(f.doc_id)
      assert(f.width == 1 + (len % 29) && f.height == 5 + ((len / 29) % 13))
      assert(f.height >= 5) // every payload exercises all five filters
    }
  }

  test("Wav decodes a hand-built golden fixture, walking unknown chunks") {
    // RIFF → fmt → a 5-byte 'fact' chunk (odd: carries a pad byte) → data.
    // A naive offset-44 reader would read the fact chunk's bytes as
    // samples; the decoder must skip it and land on 'data' exactly.
    def le(v: Int, n: Int): Seq[Byte] =
      (0 until n).map(i => ((v >>> (8 * i)) & 0xff).toByte)
    val samples = Seq[Int](100, -200, 32767, -32768)
    val data = samples.flatMap(s => le(s & 0xffff, 2))
    val fact = "fact".getBytes("US-ASCII").toSeq ++ le(5, 4) ++
      Seq.fill(5)(0x77.toByte) ++ Seq(0x00.toByte) // odd size + pad
    val fmt = "fmt ".getBytes("US-ASCII").toSeq ++ le(16, 4) ++
      le(1, 2) ++ le(1, 2) ++ le(44100, 4) ++ le(88200, 4) ++
      le(2, 2) ++ le(16, 2)
    val body = "WAVE".getBytes("US-ASCII").toSeq ++ fmt ++ fact ++
      "data".getBytes("US-ASCII").toSeq ++ le(data.length, 4) ++ data
    val bytes = ("RIFF".getBytes("US-ASCII").toSeq ++ le(body.length, 4) ++
      body).toArray
    val s = Wav.decode(bytes)
    assert(s == Wav.AudioStats(nSamples = 4, sampleRate = 44100,
      sumAmp = 100L - 200 + 32767 - 32768,
      sumSq = 100L * 100 + 200L * 200 + 32767L * 32767 + 32768L * 32768,
      peak = 32768))
  }

  test("Wav rejects what it cannot decode") {
    val good = Multimodal.syntheticWav("hello world".getBytes("UTF-8"))
    assert(Wav.decode(good).nSamples == 11)
    val badMagic = good.clone(); badMagic(0) = 'X'
    intercept[IllegalArgumentException](Wav.decode(badMagic))
    val stereo = good.clone(); stereo(22) = 2 // channels field in fmt
    intercept[IllegalArgumentException](Wav.decode(stereo))
    intercept[IllegalArgumentException](Wav.decode(good.take(50)))
  }

  test("Wav encode/decode round-trips exact sums through the junk chunk") {
    val samples = Array.tabulate(333)(i => ((i * 997 - 50000) % 32768).toShort)
    for (junk <- Seq(false, true)) {
      val s = Wav.decode(Wav.encode(8000, samples, junkChunk = junk))
      assert(s.nSamples == samples.length && s.sampleRate == 8000)
      assert(s.sumAmp == samples.map(_.toLong).sum)
      assert(s.sumSq == samples.map(x => x.toLong * x).sum)
      assert(s.peak == samples.map(x => math.abs(x.toInt)).max)
    }
  }

  test("audioStats is deterministic across partitionings and batch sizes") {
    val a = Multimodal.audioStats(spark, docs, batchSize = 64)
      .collect().sortBy(_.doc_id)
    val b = Multimodal.audioStats(spark, docs.repartition(5), batchSize = 7)
      .collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty && a.forall(f => f.sample_rate == 8000 &&
      f.n_samples > 0 && f.peak <= 32768))
  }

  test("pixelStats is deterministic across partitionings and batch sizes") {
    val a = Multimodal.pixelStats(spark, docs, batchSize = 64)
      .collect().sortBy(_.doc_id)
    val b = Multimodal.pixelStats(spark, docs.repartition(7), batchSize = 3)
      .collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty)
    // Geometry closed form holds for every doc (the decoder re-derived it
    // from the header, not from the text).
    val lens = docs.select(col("doc_id"),
      octet_length(col("text")).cast("long").as("len"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    a.foreach { f =>
      val len = lens(f.doc_id)
      assert(f.width == 1 + (len % 31) && f.height == 1 + ((len / 31) % 17))
      assert(f.n_px == f.width * f.height && f.top_row_sum > 0)
    }
  }

  test("Avi decodes a hand-built multi-frame container exactly") {
    // 2×1, 3 frames, with the JUNK chunk forcing the odd-size pad walk and
    // the trailing idx1 exercised by every encode. Frame buffers are
    // top-down BGR triplets, so frame f = [B0,G0,R0,B1,G1,R1].
    val frames = (0 until 3).map(f => Array.tabulate(6)(j => (10 * f + j + 1).toByte))
    val s = Avi.decode(Avi.encode(2, 1, frames, junkChunk = true))
    assert(s.width == 2 && s.height == 1 && s.nFrames == 3)
    // phash16, hand-derived: a 2×1 frame occupies grid cells 0 (x=0) and
    // 2 (x=1); with pixel-1's luminance always the larger, only bit 2
    // sets (strict cross-multiplied compare) → hash 4 for every frame.
    assert(s.frames == Seq(
      Avi.FrameStats(0, 1 + 4, 2 + 5, 3 + 6, 4L),
      Avi.FrameStats(1, 11 + 14, 12 + 15, 13 + 16, 4L),
      Avi.FrameStats(2, 21 + 24, 22 + 25, 23 + 26, 4L)))
  }

  test("Avi sampled decode walks every chunk but sums only sampled frames") {
    val frames = (0 until 4).map(f => Array.tabulate(9)(j => (f * 9 + j).toByte))
    val bytes = Avi.encode(3, 1, frames)
    val s = Avi.decodeSampled(bytes, 2)
    assert(s.nFrames == 4 && s.frames.map(_.frameIdx) == Seq(0, 2))
    val full = Avi.decode(bytes)
    assert(full.frames.size == 4)
    assert(s.frames == full.frames.filter(_.frameIdx % 2 == 0))
  }

  test("Avi rejects what it cannot decode (container-level cross-checks)") {
    def cc(b: Array[Byte], s: String): Int = {
      val pat = s.getBytes("US-ASCII")
      b.indices.find(i => i + 4 <= b.length &&
        pat.indices.forall(k => b(i + k) == pat(k))).get
    }
    val good = Multimodal.syntheticAvi("hello avi world".getBytes("UTF-8"))
    // len=15 → w=16, h=1, nf=4, junk chunk present (odd length)
    val g = Avi.decode(good)
    assert(g.width == 16 && g.height == 1 && g.nFrames == 4)
    val badMagic = good.clone(); badMagic(0) = 'X'
    intercept[IllegalArgumentException](Avi.decode(badMagic))
    intercept[IllegalArgumentException](Avi.decode(good.take(60)))
    // avih/strf geometry cross-validation: corrupt strf's biWidth
    val badW = good.clone(); badW(cc(badW, "strf") + 8 + 4) = 17
    intercept[IllegalArgumentException](Avi.decode(badW))
    // declared-vs-walked frame count: inflate avih dwTotalFrames
    val badN = good.clone(); badN(cc(badN, "avih") + 8 + 16) = 5
    intercept[IllegalArgumentException](Avi.decode(badN))
    // compressed frame id in a BI_RGB stream: first movi chunk → '00dc'
    val badF = good.clone(); badF(cc(badF, "00db") + 3) = 'c'
    intercept[IllegalArgumentException](Avi.decode(badF))
    // non-24-bit DIB: strf biBitCount → 8
    val badB = good.clone(); badB(cc(badB, "strf") + 8 + 14) = 8
    intercept[IllegalArgumentException](Avi.decode(badB))
  }

  test("videoStats is deterministic across partitionings and batch sizes") {
    val a = Multimodal.videoStats(spark, docs, batchSize = 64)
      .collect().sortBy(f => (f.doc_id, f.frame_idx))
    val b = Multimodal.videoStats(spark, docs.repartition(5), batchSize = 7)
      .collect().sortBy(f => (f.doc_id, f.frame_idx))
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty)
    // step-2 sampling: only even frame indices, always including frame 0,
    // and the container-level total is carried on every row.
    assert(a.forall(f => f.frame_idx % 2 == 0 && f.frame_idx < f.n_frames))
    assert(a.groupBy(_.doc_id).values.forall(_.exists(_.frame_idx == 0)))
    val lens = docs.select(col("doc_id"),
      octet_length(col("text")).cast("long").as("len"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    a.foreach { f =>
      val len = lens(f.doc_id)
      assert(f.width == 1 + (len % 19) && f.height == 1 + ((len / 19) % 13))
      assert(f.n_frames == 1 + (len % 4) && f.n_px == f.width * f.height)
    }
  }

  test("video frame phash matches an independent closed-form recompute") {
    // Straight-line reimplementation of the intended frame-hash semantics
    // from the synthesis parameters (never touching Avi/Bmp code paths):
    // frame f byte j = text[(j+f) mod len]; pixel k luminance = bytes
    // 3k..3k+2; image-space 4×4 cells; strict integer mean compare.
    def expected(text: String, f: Int): Long = {
      val b = text.getBytes("UTF-8"); val len = b.length
      val w = 1 + (len % 19); val h = 1 + ((len / 19) % 13)
      val cs = new Array[Long](16); val cn = new Array[Long](16)
      var ts = 0L
      for (k <- 0 until w * h) {
        val l = (b((3 * k + f) % len) & 0xff) + (b((3 * k + 1 + f) % len) & 0xff) +
          (b((3 * k + 2 + f) % len) & 0xff)
        val blk = (k % w) * 4 / w + 4 * ((k / w) * 4 / h)
        cs(blk) += l; cn(blk) += 1; ts += l
      }
      (0 until 16).map(i =>
        if (cs(i) * (w.toLong * h) > ts * cn(i)) 1L << i else 0L).sum
    }
    val texts = Seq("hello avi world", "the quick brown fox jumps over",
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaabbbbbbbbbbbbcccccc dddd")
    for (text <- texts) {
      val s = Avi.decodeSampled(
        Multimodal.syntheticAvi(text.getBytes("UTF-8")), 2)
      s.frames.foreach(fr =>
        assert(fr.phash16 == expected(text, fr.frameIdx),
          s"frame ${fr.frameIdx} of '$text'"))
    }
    // Planted near-dup: identical payloads hash identically frame by
    // frame (the collision the census counts); a brightness-structure
    // change flips the hash.
    val a = Avi.decode(Multimodal.syntheticAvi(texts.head.getBytes("UTF-8")))
    val b = Avi.decode(Multimodal.syntheticAvi(texts.head.getBytes("UTF-8")))
    assert(a.frames.map(_.phash16) == b.frames.map(_.phash16))
  }

  test("Avi index-seek decode matches the sequential walk frame for frame") {
    // Parity across docs (covering both junk-chunk postures and every
    // nf/geometry residue the corpus hits) and across steps.
    val texts = Seq("hello avi world", "abcd", "the quick brown fox jumps",
      "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz")
    for (text <- texts; step <- Seq(1, 2, 3)) {
      val bytes = Multimodal.syntheticAvi(text.getBytes("UTF-8"))
      assert(Avi.decodeIndexed(bytes, step) == Avi.decodeSampled(bytes, step),
        s"'$text' step $step")
    }
  }

  test("Avi index-seek decode accepts absolute offsets, rejects bad entries") {
    def cc(b: Array[Byte], s: String, from: Int = 0): Int = {
      val pat = s.getBytes("US-ASCII")
      (from until b.length - 3).find(i =>
        pat.indices.forall(k => b(i + k) == pat(k))).get
    }
    def putLE(b: Array[Byte], off: Int, v: Int): Unit =
      (0 until 4).foreach(i => b(off + i) = ((v >>> (8 * i)) & 0xff).toByte)
    def getLE(b: Array[Byte], off: Int): Int =
      (0 until 4).map(i => (b(off + i) & 0xff) << (8 * i)).sum
    val good = Multimodal.syntheticAvi("hello avi world".getBytes("UTF-8"))
    val expect = Avi.decodeSampled(good, 2)
    // Rewrite every idx1 offset from movi-relative to absolute: the
    // decoder's convention probe must detect and still land every frame.
    val moviFourcc = cc(good, "movi")
    val idx1 = cc(good, "idx1") + 8
    val abs = good.clone()
    (0 until expect.nFrames).foreach { i =>
      putLE(abs, idx1 + 16 * i + 8, getLE(good, idx1 + 16 * i + 8) + moviFourcc)
    }
    assert(Avi.decodeIndexed(abs, 2) == expect)
    // An entry pointing outside movi (into the headers) rejects loudly.
    val bad = good.clone()
    putLE(bad, idx1 + 8, 12 - moviFourcc) // resolves to the hdrl area
    intercept[IllegalArgumentException](Avi.decodeIndexed(bad, 1))
    // A non-frame entry id rejects.
    val badId = good.clone(); badId(idx1 + 3) = 'c'
    intercept[IllegalArgumentException](Avi.decodeIndexed(badId, 1))
    // idx1 disagreeing with avih's frame count rejects (truncate one entry).
    val short = good.clone()
    putLE(short, cc(short, "idx1") + 4, 16 * (expect.nFrames - 1))
    intercept[IllegalArgumentException](Avi.decodeIndexed(short, 1))
    // A duplicate index entry — individually valid, pointing at frame 0's
    // chunk again — must reject on the strictly-increasing offset rule,
    // not silently relabel frame 0's pixels as frame 1.
    val dup = good.clone()
    putLE(dup, idx1 + 16 + 8, getLE(good, idx1 + 8))
    intercept[IllegalArgumentException](Avi.decodeIndexed(dup, 1))
    // ...even when the duplicated entry itself is never sampled: the
    // index must be coherent before it is trusted.
    intercept[IllegalArgumentException](Avi.decodeIndexed(dup, 2))
    // An oversized u32 offset must hit a loud range reject, not wrap Int
    // arithmetic into an out-of-bounds read.
    val huge = good.clone()
    putLE(huge, idx1 + 8, 0x7ffffffb)
    intercept[IllegalArgumentException](Avi.decodeIndexed(huge, 1))
    // A LIST chunk with size < 4 rejects in BOTH decode postures (parity
    // of the quarantine contract, not just of well-formed decodes).
    val tinyList = good.clone()
    putLE(tinyList, cc(tinyList, "LIST") + 4, 3)
    intercept[IllegalArgumentException](Avi.decodeSampled(tinyList, 1))
    intercept[IllegalArgumentException](Avi.decodeIndexed(tinyList, 1))
  }

  test("videoFramePhashes is deterministic and census-consistent") {
    val a = Multimodal.videoFramePhashes(spark, docs, batchSize = 64)
      .collect().sortBy(r => (r._1, r._2))
    val b = Multimodal.videoFramePhashes(spark, docs.repartition(5),
      batchSize = 7).collect().sortBy(r => (r._1, r._2))
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty)
    // Hash rows agree with videoStats row-for-row on (doc, frame) keys —
    // both come from the same sampled walk.
    val keys = Multimodal.videoStats(spark, docs)
      .collect().map(f => f.doc_id -> f.frame_idx).toSet
    assert(a.map(r => r._1 -> r._2).toSet == keys)
    // 16-bit range
    assert(a.forall(r => r._3 >= 0 && r._3 < (1L << 16)))
  }
}
