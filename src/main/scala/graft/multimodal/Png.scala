package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** Real COMPRESSED image codec — the third dependency-free format, and the
  * first with an entropy-coded payload: PNG (8-bit RGB, color type 2),
  * decoded with nothing beyond `java.util.zip.Inflater` (zlib is in the
  * JDK). Unlike [[Bmp]], whose pixels sit raw in the file, PNG makes the
  * decoder do real reconstruction work, and every step is load-bearing:
  *
  *   - chunk walking with per-chunk CRC32 validation (the [[Wav]] chunk
  *     pattern, plus integrity: a flipped payload byte must reject loudly,
  *     not produce silently wrong features);
  *   - IDAT reassembly — the compressed stream is split across chunks and
  *     must be concatenated before inflating (the encoder always splits,
  *     so every synthesized payload exercises reassembly);
  *   - zlib inflate with an exact output-size contract (short or excess
  *     data is corruption, not padding);
  *   - per-row FILTER reconstruction — each scanline is delta-coded
  *     against its neighbors by one of five filters (None/Sub/Up/Average/
  *     Paeth, RFC 2083 §6); mis-implementing any filter corrupts every
  *     row below it, which the oracle's exact channel sums catch.
  *
  * Numbers in PNG are BIG-endian — the opposite of BMP/WAV; mixing them up
  * rejects at the geometry bound, not silently.
  */
object Png {

  private val Signature =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  /** Same guard as [[Bmp.MaxDim]]: dimensions whose scanlines cannot fit a
    * JVM array reject up front instead of wrapping Int arithmetic.
    */
  private val MaxDim: Int = (Int.MaxValue - 4) / 3

  private def putBE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }

  private def getBE(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def crcOf(typ: Array[Byte], data: Array[Byte], len: Int): Int = {
    val crc = new CRC32
    crc.update(typ)
    crc.update(data, 0, len)
    crc.getValue.toInt
  }

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    val out = new Array[Byte](12 + data.length)
    putBE(out, 0, data.length)
    System.arraycopy(t, 0, out, 4, 4)
    System.arraycopy(data, 0, out, 8, data.length)
    putBE(out, 8 + data.length, crcOf(t, data, data.length))
    out
  }

  /** PaethPredictor (RFC 2083 §6.6): the neighbor (left/above/upper-left)
    * closest to `a + b - c`, ties resolved left, above, upper-left.
    */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode a top-down row-major RGB pixel array (3 bytes/px) as an 8-bit
    * truecolor PNG. Row `y` is delta-coded with filter `y % 5`, so any
    * image with ≥5 rows exercises ALL five filter types; the compressed
    * stream is always split across two IDAT chunks so every decode
    * exercises reassembly.
    */
  def encode(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(width > 0 && width <= MaxDim && height > 0 && height <= MaxDim,
      s"unsupported geometry ${width}x$height")
    require(pixels.length == 3L * width * height,
      s"pixel buffer ${pixels.length} != 3*$width*$height")
    val bpr = 3 * width
    // Filtered scanlines: [filter byte][bpr delta-coded bytes] per row.
    val raw = new Array[Byte]((1 + bpr) * height)
    var y = 0
    while (y < height) {
      val f = y % 5
      raw((1 + bpr) * y) = f.toByte
      var i = 0
      while (i < bpr) {
        val cur = pixels(bpr * y + i) & 0xff
        val left = if (i >= 3) pixels(bpr * y + i - 3) & 0xff else 0
        val up = if (y > 0) pixels(bpr * (y - 1) + i) & 0xff else 0
        val ul = if (y > 0 && i >= 3) pixels(bpr * (y - 1) + i - 3) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        raw((1 + bpr) * y + 1 + i) = ((cur - pred) & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val deflater = new Deflater
    deflater.setInput(raw)
    deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    var zLen = 0
    while (!deflater.finished())
      zLen += deflater.deflate(buf, zLen, buf.length - zLen)
    deflater.end()
    val ihdr = new Array[Byte](13)
    putBE(ihdr, 0, width); putBE(ihdr, 4, height)
    ihdr(8) = 8   // bit depth
    ihdr(9) = 2   // color type: truecolor RGB
    // bytes 10-12: compression 0, filter method 0, interlace 0
    val split = math.max(1, zLen / 2) // 2 IDAT chunks: reassembly always runs
    Signature ++ chunk("IHDR", ihdr) ++
      chunk("IDAT", buf.slice(0, split)) ++
      chunk("IDAT", buf.slice(split, zLen)) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Decode an 8-bit RGB PNG to pixel statistics (same contract as
    * [[Bmp.decode]]; PNG rows are top-down and channels RGB-ordered).
    * Throws on anything that isn't the declared format, including any
    * chunk whose CRC doesn't match — loud rejects, never silently wrong
    * features.
    */
  def decode(bytes: Array[Byte]): Bmp.PixelStats = {
    require(bytes.length >= 8 + 25 + 12 &&
      (0 until 8).forall(i => bytes(i) == Signature(i)),
      "not a PNG: bad signature")
    var off = 8
    var width = -1; var height = -1
    var idat = Array.emptyByteArray
    var idatDone = false // IDAT chunks must be consecutive (RFC 2083 §4.3)
    var ended = false
    while (!ended) {
      require(off + 12 <= bytes.length, "truncated chunk header")
      val len = getBE(bytes, off)
      require(len >= 0 && off + 12 + len.toLong <= bytes.length,
        "truncated chunk data")
      val typ = new String(bytes, off + 4, 4, "US-ASCII")
      val crc = getBE(bytes, off + 8 + len)
      val typArr = java.util.Arrays.copyOfRange(bytes, off + 4, off + 8)
      val dataArr = java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + len)
      require(crc == crcOf(typArr, dataArr, len), s"CRC mismatch in '$typ'")
      typ match {
        case "IHDR" =>
          require(width < 0, "duplicate IHDR")
          require(len == 13, s"IHDR length $len")
          width = getBE(dataArr, 0); height = getBE(dataArr, 4)
          require(width > 0 && width <= MaxDim && height > 0 &&
            height <= MaxDim, s"unsupported geometry ${width}x$height")
          require(dataArr(8) == 8, s"unsupported bit depth ${dataArr(8)}")
          require(dataArr(9) == 2, s"unsupported color type ${dataArr(9)}")
          require(dataArr(10) == 0 && dataArr(11) == 0 && dataArr(12) == 0,
            "unsupported compression/filter/interlace method")
        case "IDAT" =>
          require(width > 0, "IDAT before IHDR")
          require(!idatDone, "non-consecutive IDAT chunks")
          idat = idat ++ dataArr
        case "IEND" =>
          require(len == 0, "non-empty IEND")
          ended = true
        case _ =>
          if (idat.nonEmpty) idatDone = true // ancillary chunk ends the run
      }
      off += 12 + len
    }
    require(width > 0, "no IHDR")
    require(idat.nonEmpty, "no IDAT")
    val bpr = 3 * width
    val raw = new Array[Byte]((1 + bpr) * height)
    val inflater = new Inflater
    inflater.setInput(idat)
    var got = 0
    val excess =
      try {
        while (got < raw.length && !inflater.finished()) {
          val n = inflater.inflate(raw, got, raw.length - got)
          require(n > 0 || inflater.finished(), "truncated compressed stream")
          got += n
        }
        // The stream must TERMINATE cleanly after the last expected byte:
        // a truncated tail (e.g. a clipped Adler-32 checksum) can still
        // deliver every output byte, so `finished()` — not byte count —
        // is the integrity signal.
        if (!inflater.finished()) {
          val extra = inflater.inflate(new Array[Byte](1))
          require(extra > 0 || inflater.finished(),
            "truncated compressed stream (missing terminator)")
          extra > 0
        } else false
      } catch {
        // Same reject type as every other malformed payload: corrupt
        // zlib data is quarantine-lane input, not an engine error.
        case e: java.util.zip.DataFormatException =>
          throw new IllegalArgumentException(
            s"corrupt compressed stream: ${e.getMessage}")
      } finally inflater.end()
    require(got == raw.length && !excess,
      s"decompressed size $got != expected ${raw.length} (or excess data)")
    // In-place filter reconstruction, then stats in one pass.
    var sumR = 0L; var sumG = 0L; var sumB = 0L; var topRowSum = 0L
    var y = 0
    while (y < height) {
      val f = raw((1 + bpr) * y) & 0xff
      require(f <= 4, s"unknown filter type $f in row $y")
      var i = 0
      while (i < bpr) {
        val cur = raw((1 + bpr) * y + 1 + i) & 0xff
        val left = if (i >= 3) raw((1 + bpr) * y + 1 + i - 3) & 0xff else 0
        val up = if (y > 0) raw((1 + bpr) * (y - 1) + 1 + i) & 0xff else 0
        val ul = if (y > 0 && i >= 3) raw((1 + bpr) * (y - 1) + 1 + i - 3) & 0xff
          else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        val v = (cur + pred) & 0xff
        raw((1 + bpr) * y + 1 + i) = v.toByte
        (i % 3: @annotation.switch) match {
          case 0 => sumR += v
          case 1 => sumG += v
          case 2 => sumB += v
        }
        if (y == 0) topRowSum += v
        i += 1
      }
      y += 1
    }
    Bmp.PixelStats(width, height, width.toLong * height, sumB, sumG, sumR,
      topRowSum)
  }
}
