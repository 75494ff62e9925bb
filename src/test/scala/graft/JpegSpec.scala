package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Jpeg, Multimodal}

/** The baseline JPEG codec. The independent truth here is the JDK's own
  * ImageIO JPEG implementation (a wrapper over the platform's native
  * libjpeg-derived coder, written by neither side of this codec):
  *
  *   - streams THIS encoder writes must decode bit-identically under
  *     ImageIO (standards compliance of the bitstream: markers, DHT wire
  *     form, stuffing, restart markers);
  *   - streams ImageIO writes must decode under THIS decoder to within
  *     the spec's IDCT tolerance of ImageIO's own reader (third-party
  *     tables, third-party entropy stream).
  *
  * Plus the exactness contract (block-constant + unit quantizer → exact),
  * lossy round-trip error bounds, the generated zigzag table pinned
  * against the T.81 constant, and loud malformed-payload rejects.
  */
class JpegSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def rng(seed: Long) = new scala.util.Random(seed)

  /** Deterministic block-constant grayscale image. */
  private def blockImage(bw: Int, bh: Int, vals: Array[Int]): Array[Byte] = {
    val w = 8 * bw; val h = 8 * bh
    val px = new Array[Byte](w * h)
    for (b <- 0 until bw * bh; y <- 0 until 8)
      java.util.Arrays.fill(px, w * (8 * (b / bw) + y) + 8 * (b % bw),
        w * (8 * (b / bw) + y) + 8 * (b % bw) + 8, vals(b).toByte)
    px
  }

  private def imageIoRead(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not parse the stream")
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Int](w * h)
    val raster = img.getRaster
    for (y <- 0 until h; x <- 0 until w)
      out(w * y + x) = raster.getSample(x, y, 0)
    (w, h, out)
  }

  private def imageIoWriteGray(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, px(w * y + x))
    val bos = new java.io.ByteArrayOutputStream
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    bos.toByteArray
  }

  test("generated zigzag order matches the T.81 constant") {
    assert(Jpeg.Zigzag.toSeq == Seq(
      0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
      12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
      35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
      58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63))
  }

  test("block-constant + unit quantizer round-trips exactly") {
    val vals = Array(0, 255, 128, 17, 200, 66) // extremes included
    val bytes = Jpeg.encode(24, 16, blockImage(3, 2, vals))
    val g = Jpeg.decodePixels(bytes)
    assert(g.width == 24 && g.height == 16)
    for (b <- 0 until 6; y <- 0 until 8; x <- 0 until 8)
      assert(g.pixels(24 * (8 * (b / 3) + y) + 8 * (b % 3) + x) == vals(b),
        s"block $b pixel ($x,$y)")
    val s = Jpeg.decode(bytes)
    assert(s.nPx == 384 && s.nBlocks == 6)
    assert(s.sumGray == vals.map(_ * 64L).sum)
    assert(s.topRowSum == 8L * (vals(0) + vals(1) + vals(2)))
  }

  test("non-multiple-of-8 dimensions: edge blocks crop correctly") {
    // A constant image stays constant through edge-block replication, so
    // decode must be exact at any geometry.
    val bytes = Jpeg.encode(13, 10, Array.fill(130)(77.toByte))
    val g = Jpeg.decodePixels(bytes)
    assert(g.width == 13 && g.height == 10)
    assert(g.pixels.forall(_ == 77))
    assert(Jpeg.decode(bytes).nBlocks == 2 * 2)
  }

  test("ImageIO decodes this encoder's stream bit-identically") {
    val vals = Array.tabulate(12)(i => (i * 23) % 256)
    val bytes = Jpeg.encode(32, 24, blockImage(4, 3, vals))
    val (w, h, px) = imageIoRead(bytes)
    assert(w == 32 && h == 24)
    val mine = Jpeg.decodePixels(bytes)
    assert(px.toSeq == mine.pixels.toSeq,
      "ImageIO and this decoder disagree on this encoder's stream")
  }

  test("restart markers: ImageIO and this decoder agree, DC resets hold") {
    val vals = Array.tabulate(15)(i => (i * 37 + 11) % 256)
    // interval 2 over 15 MCUs: resync runs 7 times, RST index wraps 0..6.
    val bytes = Jpeg.encode(40, 24, blockImage(5, 3, vals),
      Jpeg.QuantUnit, restartInterval = 2)
    assert(bytes.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd0), "no RST0 in stream")
    val mine = Jpeg.decodePixels(bytes)
    for (b <- 0 until 15; y <- 0 until 8; x <- 0 until 8)
      assert(mine.pixels(40 * (8 * (b / 5) + y) + 8 * (b % 5) + x) == vals(b))
    val (_, _, px) = imageIoRead(bytes)
    assert(px.toSeq == mine.pixels.toSeq)
  }

  test("this decoder matches ImageIO's reader on ImageIO-written streams") {
    val r = rng(42)
    for (trial <- 0 until 3) {
      val w = 24 + r.nextInt(40)
      val h = 16 + r.nextInt(40)
      // Smooth-ish content (sums of low-frequency terms) plus noise — the
      // signal class JPEG is built for, avoiding pathological blocks.
      val px = Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        val v = 128 + 80 * math.sin(x * 0.2 + trial) *
          math.cos(y * 0.15) + r.nextInt(11) - 5
        math.max(0, math.min(255, v.toInt))
      }
      val bytes = imageIoWriteGray(w, h, px)
      val mine = Jpeg.decodePixels(bytes)
      val (ww, hh, theirs) = imageIoRead(bytes)
      assert(ww == mine.width && hh == mine.height)
      val diffs = mine.pixels.zip(theirs).map(p => math.abs(p._1 - p._2))
      assert(diffs.max <= 2,
        s"trial $trial: max IDCT disagreement ${diffs.max} > 2")
      assert(diffs.map(_.toDouble).sum / diffs.length <= 0.5,
        s"trial $trial: mean disagreement too high")
    }
  }

  test("lossy round-trip error bound with the Annex K table") {
    val r = rng(7)
    val w = 48; val h = 40
    val px = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      val v = 128 + 60 * math.sin(x * 0.25) * math.cos(y * 0.2) +
        r.nextInt(9) - 4
      math.max(0, math.min(255, v.toInt))
    }
    val bytes = Jpeg.encode(w, h, px.map(_.toByte), Jpeg.QuantStd)
    val g = Jpeg.decodePixels(bytes)
    val errs = g.pixels.zip(px).map(p => math.abs(p._1 - p._2))
    // Annex K at this content: small per-pixel error, no gross corruption.
    assert(errs.map(_.toDouble).sum / errs.length <= 6.0, "mean error")
    assert(errs.max <= 60, s"max error ${errs.max}: block-level corruption")
    // Unit quantizer: only FDCT coefficient rounding remains.
    val exact = Jpeg.decodePixels(Jpeg.encode(w, h, px.map(_.toByte)))
    val e2 = exact.pixels.zip(px).map(p => math.abs(p._1 - p._2))
    assert(e2.max <= 8 && e2.map(_.toDouble).sum / e2.length <= 1.0,
      s"unit-quantizer error max=${e2.max}")
  }

  test("4:4:4 color: block-constant planes round-trip exactly (and with RSTs)") {
    val bw = 3; val bh = 2
    val w = 8 * bw; val h = 8 * bh
    val vals = Array.tabulate(3 * bw * bh)(i => (i * 41 + 7) % 256)
    val ycc = new Array[Byte](3 * w * h)
    for (b <- 0 until bw * bh; c <- 0 until 3; y <- 0 until 8; x <- 0 until 8)
      ycc(3 * (w * (8 * (b / bw) + y) + 8 * (b % bw) + x) + c) =
        vals(3 * b + c).toByte
    for (rst <- Seq(0, 2)) {
      val bytes = Jpeg.encodeColor(w, h, ycc, Jpeg.QuantUnit, rst)
      val g = Jpeg.decodeYcc(bytes)
      assert(g.width == w && g.height == h)
      for (b <- 0 until bw * bh; y <- 0 until 8; x <- 0 until 8) {
        val i = w * (8 * (b / bw) + y) + 8 * (b % bw) + x
        assert(g.y(i) == vals(3 * b) && g.cb(i) == vals(3 * b + 1) &&
          g.cr(i) == vals(3 * b + 2), s"rst=$rst block $b px ($x,$y)")
      }
    }
  }

  test("ImageIO decodes this encoder's 4:4:4 color stream (BT.601 within 2)") {
    val r = rng(11)
    val w = 32; val h = 24
    val ycc = Array.tabulate(3 * w * h) { _ => (40 + r.nextInt(176)).toByte }
    // Block-constant per plane so the codec itself is exact and the only
    // disagreement left is the two readers' color-conversion rounding.
    val cst = new Array[Byte](3 * w * h)
    for (by <- 0 until h / 8; bx <- 0 until w / 8; c <- 0 until 3) {
      val v = ycc(3 * (8 * by * w + 8 * bx) + c)
      for (y <- 0 until 8; x <- 0 until 8)
        cst(3 * (w * (8 * by + y) + 8 * bx + x) + c) = v
    }
    val bytes = Jpeg.encodeColor(w, h, cst)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null && img.getWidth == w && img.getHeight == h)
    val mine = Jpeg.decodeYcc(bytes)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val (mr, mg, mb) = Jpeg.yccToRgb(mine.y(w * y + x), mine.cb(w * y + x),
        mine.cr(w * y + x))
      maxDiff = math.max(maxDiff, math.abs(((rgb >> 16) & 0xff) - mr))
      maxDiff = math.max(maxDiff, math.abs(((rgb >> 8) & 0xff) - mg))
      maxDiff = math.max(maxDiff, math.abs((rgb & 0xff) - mb))
    }
    assert(maxDiff <= 2, s"color conversion disagreement $maxDiff > 2")
  }

  test("4:2:0: own-encoder streams decode exactly on constant-chroma content") {
    // Y varies per 16x16-aligned region, Cb/Cr are globally constant: the
    // 2x2 chroma downsample is lossless, every block (luma AND chroma) is
    // constant, so the subsampled round-trip must be EXACT — and ImageIO's
    // interpolating upsampler agrees with the box upsampler on constant
    // planes, so its read must match within color-conversion rounding.
    val w = 48; val h = 32
    val yv = Array.tabulate((w / 16) * (h / 16))(i => (30 + i * 37) % 256)
    val ycc = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w) {
      ycc(3 * (w * y + x)) = yv((w / 16) * (y / 16) + x / 16).toByte
      ycc(3 * (w * y + x) + 1) = 90.toByte
      ycc(3 * (w * y + x) + 2) = 170.toByte
    }
    val bytes = Jpeg.encodeColor420(w, h, ycc)
    val g = Jpeg.decodeYcc(bytes)
    for (y <- 0 until h; x <- 0 until w) {
      val i = w * y + x
      assert(g.y(i) == (ycc(3 * i) & 0xff), s"Y at ($x,$y)")
      assert(g.cb(i) == 90 && g.cr(i) == 170, s"chroma at ($x,$y)")
    }
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null && img.getWidth == w && img.getHeight == h)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val (mr, mg, mb) = Jpeg.yccToRgb(g.y(w * y + x), 90, 170)
      maxDiff = math.max(maxDiff, math.abs(((rgb >> 16) & 0xff) - mr)
        .max(math.abs(((rgb >> 8) & 0xff) - mg))
        .max(math.abs((rgb & 0xff) - mb)))
    }
    assert(maxDiff <= 2, s"ImageIO disagreement $maxDiff on 4:2:0 stream")
  }

  test("REAL ImageIO-written 4:2:0 color file decodes within tolerance") {
    // Gray-valued 16x16 patches: R=G=B means Cb=Cr=128 globally, so the
    // two readers' different chroma upsamplers see only constant planes
    // and the comparison isolates THIS decoder's subsampled MCU walk.
    val w = 64; val h = 48
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (25 + 41 * ((w / 16) * (y / 16) + x / 16)) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val bytes = bos.toByteArray
    // Prove the file really is subsampled (SOF0 luma factor 0x22), so
    // this leg can't silently degrade to the 4:4:4 path.
    val sof = bytes.indices.find(i =>
      (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xc0).get
    assert((bytes(sof + 11) & 0xff) == 0x22, "ImageIO stream is not 4:2:0")
    val mine = Jpeg.decodeYcc(bytes)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    var sumDiff = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = back.getRGB(x, y)
      val (mr, mg, mb) = Jpeg.yccToRgb(mine.y(w * y + x),
        mine.cb(w * y + x), mine.cr(w * y + x))
      val d = math.abs(((rgb >> 16) & 0xff) - mr)
        .max(math.abs(((rgb >> 8) & 0xff) - mg))
        .max(math.abs((rgb & 0xff) - mb))
      maxDiff = math.max(maxDiff, d)
      sumDiff += d
    }
    assert(maxDiff <= 2, s"real 4:2:0 file disagreement $maxDiff > 2")
    assert(sumDiff.toDouble / (w * h) <= 0.5, "mean disagreement too high")
  }

  test("synthetic color payloads decode to the closed form") {
    for (text <- Seq("a", "colorful", "y" * 20, "qwerty" * 9)) { // 20 hits RST
      val tb = text.getBytes("US-ASCII")
      val g = Jpeg.decodeYcc(Multimodal.syntheticJpegColor(tb))
      val bw = 1 + (tb.length % 6)
      val bh = 1 + ((tb.length / 6) % 4)
      assert(g.width == 8 * bw && g.height == 8 * bh)
      def planted(b: Int, c: Int) = tb((3 * b + c) % tb.length) & 0xff
      var sy = 0L; var scb = 0L; var scr = 0L
      for (b <- 0 until bw * bh) {
        sy += 64L * planted(b, 0); scb += 64L * planted(b, 1)
        scr += 64L * planted(b, 2)
      }
      assert(g.y.map(_.toLong).sum == sy, s"'$text' Y plane")
      assert(g.cb.map(_.toLong).sum == scb, s"'$text' Cb plane")
      assert(g.cr.map(_.toLong).sum == scr, s"'$text' Cr plane")
    }
  }

  test("synthetic corpus payloads decode to the closed form") {
    for (text <- Seq("a", "hello world", "x" * 21, "the quick brown fox",
        "abcdef" * 13)) { // 21 and 78 hit the restart-marker branch
      val tb = text.getBytes("US-ASCII")
      val s = Jpeg.decode(Multimodal.syntheticJpeg(tb))
      val bw = 1 + (tb.length % 7)
      val bh = 1 + ((tb.length / 7) % 5)
      val vals = Array.tabulate(bw * bh)(b => tb(b % tb.length) & 0xff)
      assert(s.width == 8 * bw && s.height == 8 * bh)
      assert(s.nBlocks == bw * bh)
      assert(s.sumGray == vals.map(_ * 64L).sum, s"text '$text'")
      assert(s.topRowSum == 8L * vals.take(bw).sum)
    }
  }

  test("malformed payloads reject loudly") {
    val good = Jpeg.encode(16, 16, blockImage(2, 2, Array(1, 2, 3, 4)))
    def rejects(bytes: Array[Byte], hint: String): Unit =
      assertThrows[IllegalArgumentException](Jpeg.decodePixels(bytes))

    rejects(Array[Byte](0, 1, 2, 3), "bad SOI")
    rejects(good.take(20), "truncated in segments")
    rejects(good.dropRight(12), "truncated entropy stream / missing EOI")
    // Progressive frame: flip SOF0 to SOF2.
    val prog = good.clone()
    val sofAt = prog.indices.find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    rejects(prog, "progressive")
    // SOS referencing an undefined Huffman table id.
    val badTab = good.clone()
    val sosAt = badTab.indices.find(i =>
      (badTab(i) & 0xff) == 0xff && (badTab(i + 1) & 0xff) == 0xda).get
    badTab(sosAt + 6) = 0x33.toByte // Td=3/Ta=3: never defined
    rejects(badTab, "undefined Huffman table")
    // Zero quantizer value (divide-by-zero lane).
    val badQ = good.clone()
    val dqtAt = badQ.indices.find(i =>
      (badQ(i) & 0xff) == 0xff && (badQ(i + 1) & 0xff) == 0xdb).get
    badQ(dqtAt + 5) = 0x00.toByte
    rejects(badQ, "zero quantizer")
    // Grayscale API on a color stream (and vice versa) rejects.
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream
    javax.imageio.ImageIO.write(img, "jpg", bos)
    rejects(bos.toByteArray, "color stream through the grayscale API")
    assertThrows[IllegalArgumentException](Jpeg.decodeYcc(good))
  }

  test("restart-marker resynchronization rejects out-of-order RSTs") {
    val vals = Array.tabulate(8)(i => 10 + i)
    val bytes = Jpeg.encode(32, 16, blockImage(4, 2, vals),
      Jpeg.QuantUnit, restartInterval = 2)
    val rstAt = bytes.indices.find(i =>
      (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xd0).get
    val bad = bytes.clone()
    bad(rstAt + 1) = 0xd5.toByte // RST5 where RST0 expected
    assertThrows[IllegalArgumentException](Jpeg.decodePixels(bad))
  }

  test("Spark pipeline: jpegStats matches the per-doc closed form") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
    val got = Multimodal.jpegStats(spark, docs).collect()
      .map(f => f.doc_id -> f).toMap
    val expect = docs.select(col("doc_id"), col("text"))
      .collect().map { row =>
        val id = row.getLong(0)
        val tb = row.getString(1).getBytes("US-ASCII")
        val bw = 1 + (tb.length % 7)
        val bh = 1 + ((tb.length / 7) % 5)
        val vals = Array.tabulate(bw * bh)(b => tb(b % tb.length) & 0xff)
        (id, 8L * bw, 8L * bh, vals.map(_ * 64L).sum, 8L * vals.take(bw).sum)
      }
    assert(expect.nonEmpty && got.size == expect.length)
    expect.foreach { case (id, w, h, sum, top) =>
      val f = got(id)
      assert(f.width == w && f.height == h && f.sum_gray == sum &&
        f.top_row_sum == top, s"doc $id")
    }
  }
}
