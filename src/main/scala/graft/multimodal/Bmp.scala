package graft.multimodal

/** Real (non-stub) image codec for the one raster format parseable with
  * zero dependencies: uncompressed 24-bit BMP (BITMAPFILEHEADER +
  * BITMAPINFOHEADER, BI_RGB). Unlike [[Multimodal.FakeCodec]], the decode
  * here does the actual byte work a media pipeline's ingest stage does —
  * little-endian header field parsing, 4-byte row-stride padding, bottom-up
  * row order, BGR channel order — and every one of those details is
  * load-bearing: mishandling any of them changes the per-channel means or
  * the top-row checksum the `mm_pixel_stats` oracle verifies.
  *
  * The encoder exists so the corpus's text bytes can stand in for real
  * camera payloads deterministically (the container ships no media files);
  * the decoder never sees the construction parameters — only the bytes.
  */
object Bmp {

  /** Pixel-level features from a decoded image. Channel sums stay exact
    * longs; callers derive means so rounding happens once, in the query
    * layer, with the same epsilon-shifted round as every other query.
    */
  final case class PixelStats(width: Int, height: Int, nPx: Long,
      sumB: Long, sumG: Long, sumR: Long, topRowSum: Long)

  private def putLE(b: Array[Byte], off: Int, v: Int, n: Int): Unit = {
    var i = 0
    while (i < n) { b(off + i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
  }

  private def getLE(b: Array[Byte], off: Int, n: Int): Int = {
    var v = 0
    var i = 0
    while (i < n) { v |= (b(off + i) & 0xff) << (8 * i); i += 1 }
    v
  }

  /** Dimensions above this cannot possibly fit a JVM byte array (stride
    * alone would exceed Int.MaxValue), so they are rejected up front —
    * otherwise `3*width` wraps in Int arithmetic, the stride goes
    * zero/negative, the truncation require passes vacuously, and decode
    * dies later with an index error instead of the documented loud reject.
    */
  private val MaxDim: Int = (Int.MaxValue - 3) / 3

  /** Row stride: 3 bytes/px rounded up to a 4-byte boundary (the BMP spec's
    * scanline alignment — the padding bytes are NOT pixel data). Computed
    * in Long so adversarial widths can't wrap before the MaxDim check.
    */
  def rowSize(width: Int): Int = {
    require(width >= 0 && width <= MaxDim, s"width $width out of range")
    ((3L * width + 3) / 4 * 4).toInt
  }

  /** Encode a top-down row-major BGR pixel array (3 bytes per pixel,
    * `pixels.length == 3*width*height`) as a standard bottom-up 24-bit BMP.
    */
  def encode(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(width > 0 && width <= MaxDim && height > 0 && height <= MaxDim,
      s"unsupported geometry ${width}x$height")
    require(pixels.length == 3L * width * height,
      s"pixel buffer ${pixels.length} != 3*$width*$height")
    val stride = rowSize(width)
    val dataSize = stride * height
    val out = new Array[Byte](54 + dataSize) // zero-filled => padding bytes 0
    out(0) = 'B'; out(1) = 'M'
    putLE(out, 2, 54 + dataSize, 4)  // file size
    putLE(out, 10, 54, 4)            // pixel data offset
    putLE(out, 14, 40, 4)            // BITMAPINFOHEADER size
    putLE(out, 18, width, 4)
    putLE(out, 22, height, 4)        // positive => bottom-up
    putLE(out, 26, 1, 2)             // planes
    putLE(out, 28, 24, 2)            // bits per pixel
    putLE(out, 30, 0, 4)             // BI_RGB (uncompressed)
    putLE(out, 34, dataSize, 4)
    var y = 0
    while (y < height) {
      // image row y (0 = top) lands at file row (height-1-y): bottom-up.
      val dst = 54 + (height - 1 - y) * stride
      System.arraycopy(pixels, 3 * width * y, out, dst, 3 * width)
      y += 1
    }
    out
  }

  private final case class Header(off: Int, width: Int, height: Int,
      stride: Int)

  /** Validate + parse the two headers. Throws on anything that isn't the
    * declared format — an ingest pipeline wants loud rejects (quarantine
    * lane), not silently wrong features.
    */
  private def parseHeader(bytes: Array[Byte]): Header = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP: bad magic/size")
    val off = getLE(bytes, 10, 4)
    val width = getLE(bytes, 18, 4)
    val height = getLE(bytes, 22, 4)
    val bpp = getLE(bytes, 28, 2)
    val compression = getLE(bytes, 30, 4)
    // Lower bound too: a corrupt offset pointing into the headers (or a
    // huge u32 read back as negative) must reject loudly, not read header
    // bytes as pixels.
    require(off >= 54, s"pixel data offset $off inside the headers")
    require(bpp == 24, s"unsupported bpp $bpp (only 24-bit)")
    require(compression == 0, s"unsupported compression $compression")
    require(width > 0 && width <= MaxDim && height > 0 && height <= MaxDim,
      s"unsupported geometry ${width}x$height")
    val stride = rowSize(width)
    require(off + stride.toLong * height <= bytes.length,
      "truncated pixel data")
    Header(off, width, height, stride)
  }

  /** Decode a 24-bit uncompressed BMP to pixel statistics. */
  def decode(bytes: Array[Byte]): PixelStats = {
    val h = parseHeader(bytes)
    var sumB = 0L; var sumG = 0L; var sumR = 0L; var topRowSum = 0L
    var y = 0
    while (y < h.height) {
      val src = h.off + (h.height - 1 - y) * h.stride // undo bottom-up
      var x = 0
      while (x < h.width) {
        val b = bytes(src + 3 * x) & 0xff
        val g = bytes(src + 3 * x + 1) & 0xff
        val r = bytes(src + 3 * x + 2) & 0xff
        sumB += b; sumG += g; sumR += r
        if (y == 0) topRowSum += b + g + r
        x += 1
      }
      y += 1
    }
    PixelStats(h.width, h.height, h.width.toLong * h.height, sumB, sumG,
      sumR, topRowSum)
  }

  /** 16-bit perceptual hash (blockhash family, Yang et al. 2006 lineage):
    * the image is cut into a 4×4 grid IN IMAGE SPACE (top-down — the
    * bottom-up file order must be undone, or every hash is vertically
    * mirrored), each cell's luminance sum (b+g+r, no division) is compared
    * against the global mean by exact integer cross-multiplication
    * (`cellSum * nPx > totalSum * cellN` — no floats, so every engine
    * computes the identical bit; the products are compared through
    * 128-bit arithmetic, so even a gigapixel image cannot silently wrap
    * a Long), and bit `by*4+bx` is set when the cell
    * is brighter than average. Empty cells (width or height < 4) compare
    * 0 > 0 and stay 0. Two images with the same coarse light/dark layout
    * collide — the near-dup candidate key for images, the visual analog
    * of SimHash banding.
    */
  def phash16(bytes: Array[Byte]): Int = blockHash(bytes, 4).toInt

  /** 64-bit perceptual hash: the same blockhash over an 8×8 grid — the
    * production-width key. 16 bits collide too eagerly for a corpus-scale
    * census; 64 bits make exact collisions rare enough that near-dups are
    * found by small HAMMING DISTANCE instead, which the 4×16-bit Manku
    * pigeonhole (`mm_phash_hamming`) searches without an all-pairs
    * product — the visual twin of `dedup_simhash_hamming`.
    */
  def phash64(bytes: Array[Byte]): Long = blockHash(bytes, 8)

  private def blockHash(bytes: Array[Byte], grid: Int): Long = {
    val h = parseHeader(bytes)
    val cellSum = new Array[Long](grid * grid)
    val cellN = new Array[Long](grid * grid)
    var y = 0
    while (y < h.height) {
      val src = h.off + (h.height - 1 - y) * h.stride
      val by = y * grid / h.height
      var x = 0
      while (x < h.width) {
        val lum = (bytes(src + 3 * x) & 0xff) + (bytes(src + 3 * x + 1) & 0xff) +
          (bytes(src + 3 * x + 2) & 0xff)
        val cell = by * grid + x * grid / h.width
        cellSum(cell) += lum
        cellN(cell) += 1
        x += 1
      }
      y += 1
    }
    val totalSum = cellSum.sum
    val totalN = cellN.sum
    var hash = 0L
    var i = 0
    while (i < grid * grid) {
      if (productGreater(cellSum(i), totalN, totalSum, cellN(i)))
        hash |= 1L << i
      i += 1
    }
    hash
  }

  /** `a*b > c*d` for non-negative longs, exact at any magnitude: compare
    * the full 128-bit products (a 64-bit multiply wraps at ~1.1e8 pixels:
    * cellSum·nPx approaches 765·nPx²/16 > Long.MaxValue well inside real
    * image sizes).
    */
  private[multimodal] def productGreater(a: Long, b: Long, c: Long,
      d: Long): Boolean = {
    val hi1 = Math.multiplyHigh(a, b); val lo1 = a * b
    val hi2 = Math.multiplyHigh(c, d); val lo2 = c * d
    hi1 > hi2 || (hi1 == hi2 && java.lang.Long.compareUnsigned(lo1, lo2) > 0)
  }
}
