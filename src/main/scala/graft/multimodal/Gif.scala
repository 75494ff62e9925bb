package graft.multimodal

import scala.collection.mutable

/** Real image codec #3, and the second ENTROPY-CODED one: GIF87a with
  * table-based LZW. Where PNG exercises DEFLATE (Huffman + LZ77 via the
  * JDK), GIF's LZW is a genuinely different coder family — an adaptive
  * DICTIONARY code with variable-width codes (9→12 bits, LSB-first bit
  * packing), explicit CLEAR/EOI control codes, dictionary resets at 4096
  * entries, and the classic KwKwK corner case (a code referencing the
  * entry being defined). The decoder does the real byte work a media
  * ingest stage does: screen/image descriptor parse, global color table,
  * sub-block reassembly, bit-level code extraction, full string-table
  * reconstruction — loud rejects on anything malformed, never silently
  * wrong pixels.
  *
  * Scope (the synthesized corpus contract, like Bmp/Png): GIF87a, one
  * image, 256-entry global color table, no interlace, no local color
  * table. Anything else rejects loudly.
  */
object Gif {

  /** Decoded index-stream features: palette-indexed stats stay exact longs
    * (the palette here is grayscale k→(k,k,k), so index stats ARE pixel
    * stats) and the distinct-index count exposes palette utilization.
    */
  final case class IndexStats(width: Int, height: Int, nPx: Long,
      sumIdx: Long, nColors: Int, topRowSum: Long)

  private def putLE16(b: mutable.ArrayBuilder[Byte], v: Int): Unit = {
    b += (v & 0xff).toByte
    b += ((v >>> 8) & 0xff).toByte
  }

  // ---- encoder (synthesis side) ----

  /** Encode an index stream as a GIF87a file with a 256-entry grayscale
    * global color table. A REAL adaptive LZW encoder (string table,
    * variable code width, 4096-entry reset) — not the fixed-width
    * "uncompressed GIF" trick — so round-trips exercise dictionary growth,
    * width bumps and resets on every payload.
    */
  def encode(width: Int, height: Int, indices: Array[Byte]): Array[Byte] = {
    require(width > 0 && width <= 0xffff && height > 0 && height <= 0xffff,
      s"bad geometry ${width}x$height")
    // Long product: 0xffff * 0xffff overflows Int, and a wrapped compare
    // would accept a mismatched index stream instead of rejecting loudly.
    require(indices.length.toLong == width.toLong * height,
      s"index stream ${indices.length} != $width*$height")
    val out = mutable.ArrayBuilder.make[Byte]
    out ++= "GIF87a".getBytes("US-ASCII")
    putLE16(out, width); putLE16(out, height)
    out += 0xf7.toByte // GCT present, 8-bit color resolution, 256 entries
    out += 0          // background color index
    out += 0          // aspect ratio
    var k = 0
    while (k < 256) { // grayscale palette: index k → (k,k,k)
      out += k.toByte; out += k.toByte; out += k.toByte
      k += 1
    }
    out += 0x2c // image descriptor
    putLE16(out, 0); putLE16(out, 0); putLE16(out, width); putLE16(out, height)
    out += 0 // no local color table, no interlace
    out += 8 // LZW minimum code size

    // LZW: dictionary keyed on (prefixCode << 8 | nextByte).
    val Clear = 256
    val Eoi = 257
    val dict = new mutable.HashMap[Int, Int]
    var nextCode = 258
    var codeSize = 9
    var bitBuf = 0L
    var bitCnt = 0
    val data = mutable.ArrayBuilder.make[Byte]
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += codeSize
      while (bitCnt >= 8) {
        data += (bitBuf & 0xff).toByte
        bitBuf >>>= 8
        bitCnt -= 8
      }
    }
    emit(Clear)
    var cur = indices(0) & 0xff
    var i = 1
    while (i < indices.length) {
      val b = indices(i) & 0xff
      val key = (cur << 8) | b
      dict.get(key) match {
        case Some(code) => cur = code
        case None =>
          emit(cur)
          dict(key) = nextCode
          // Width bumps when the NEXT code to assign no longer fits the
          // current width; at 4096 the table is full → CLEAR + reset.
          if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
          nextCode += 1
          if (nextCode == 4096) {
            emit(Clear)
            dict.clear()
            nextCode = 258
            codeSize = 9
          }
          cur = b
      }
      i += 1
    }
    emit(cur)
    emit(Eoi)
    if (bitCnt > 0) data += (bitBuf & 0xff).toByte
    val lzw = data.result()
    // Sub-blocks: ≤255 bytes each, length-prefixed, zero terminator.
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out += n.toByte
      var j = 0
      while (j < n) { out += lzw(off + j); j += 1 }
      off += n
    }
    out += 0    // block terminator
    out += 0x3b // trailer
    out.result()
  }

  // ---- decoder ----

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Decode a GIF87a file to index-stream statistics. Full LZW: variable
    * code width, CLEAR resets, KwKwK, sub-block reassembly. Throws on
    * anything outside the declared format.
    */
  def decode(bytes: Array[Byte]): IndexStats = {
    require(bytes.length >= 6 + 7 + 768 + 10 + 1 + 2,
      "not a GIF: too short")
    require(new String(bytes, 0, 6, "US-ASCII") == "GIF87a",
      "not a GIF: bad magic")
    val sw = le16(bytes, 6)
    val sh = le16(bytes, 8)
    val packed = bytes(10) & 0xff
    require((packed & 0x80) != 0, "no global color table")
    val gctSize = 2 << (packed & 7)
    require(gctSize == 256, s"unsupported color table size $gctSize")
    // Grayscale-palette contract of the synthesized corpus: index stats
    // below are pixel stats only because palette[k] = (k,k,k) — verify it
    // rather than assume it.
    var p = 13
    var k = 0
    while (k < 256) {
      require((bytes(p) & 0xff) == k && (bytes(p + 1) & 0xff) == k &&
        (bytes(p + 2) & 0xff) == k, s"palette entry $k is not grayscale")
      p += 3; k += 1
    }
    require((bytes(p) & 0xff) == 0x2c, "expected image descriptor")
    val left = le16(bytes, p + 1); val top = le16(bytes, p + 3)
    val w = le16(bytes, p + 5); val h = le16(bytes, p + 7)
    require(left == 0 && top == 0 && w == sw && h == sh,
      s"image ${w}x$h@($left,$top) does not fill the ${sw}x$sh screen")
    require((bytes(p + 9) & 0xff) == 0, "local color table/interlace unsupported")
    val minCode = bytes(p + 10) & 0xff
    require(minCode == 8, s"unsupported LZW minimum code size $minCode")
    p += 11

    // Reassemble the LZW stream from sub-blocks.
    val lzwB = mutable.ArrayBuilder.make[Byte]
    var blockLen = bytes(p) & 0xff
    while (blockLen != 0) {
      require(p + 1 + blockLen < bytes.length, "truncated sub-block")
      lzwB ++= java.util.Arrays.copyOfRange(bytes, p + 1, p + 1 + blockLen)
      p += 1 + blockLen
      blockLen = bytes(p) & 0xff
    }
    require(p + 1 < bytes.length && (bytes(p + 1) & 0xff) == 0x3b,
      "missing trailer")
    val lzw = lzwB.result()

    // String table: prefix/suffix arrays (entry = prefix chain + suffix).
    val Clear = 256
    val Eoi = 257
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var nextCode = 258
    var codeSize = 9
    var bitPos = 0
    def readCode(): Int = {
      require(bitPos + codeSize <= lzw.length * 8, "truncated LZW stream")
      var v = 0
      var got = 0
      var bp = bitPos
      while (got < codeSize) {
        val byte = lzw(bp >> 3) & 0xff
        val avail = 8 - (bp & 7)
        val take = math.min(codeSize - got, avail)
        v |= ((byte >> (bp & 7)) & ((1 << take) - 1)) << got
        got += take
        bp += take
      }
      bitPos += codeSize
      v
    }

    val n = w.toLong * h
    var produced = 0L
    var sumIdx = 0L
    var topRowSum = 0L
    val seen = new Array[Boolean](256)
    var nColors = 0
    // Emit one index (first-fit into the running stats — the decoder never
    // materializes the full frame, the windowed/streaming decode shape).
    def out(idx: Int): Unit = {
      require(produced < n, s"LZW produced more than $n pixels")
      sumIdx += idx
      if (produced < w) topRowSum += idx
      if (!seen(idx)) { seen(idx) = true; nColors += 1 }
      produced += 1
    }
    // Decode one code's expansion (prefix chain is built last-byte-first).
    val stack = new Array[Byte](4096)
    def expand(code: Int): Int = { // returns the FIRST byte of the expansion
      var depth = 0
      var c = code
      while (c >= 258) {
        stack(depth) = suffix(c)
        depth += 1
        c = prefix(c)
        require(depth < 4096, "corrupt LZW prefix chain")
      }
      val first = c
      out(first)
      var d = depth - 1
      while (d >= 0) { out(stack(d) & 0xff); d -= 1 }
      first
    }

    var prev = -1
    var done = false
    while (!done) {
      val code = readCode()
      if (code == Eoi) {
        done = true
      } else if (code == Clear) {
        nextCode = 258
        codeSize = 9
        prev = -1
      } else if (prev < 0) {
        require(code < 256, s"first code after clear is not a literal: $code")
        out(code)
        prev = code
      } else {
        require(code <= nextCode, s"LZW code $code beyond table ($nextCode)")
        val first =
          if (code == nextCode) {
            // KwKwK: the code being defined right now — its expansion is
            // expansion(prev) followed by first(prev).
            require(nextCode < 4096, "KwKwK with a full table")
            val f = expand(prev)
            out(f)
            f
          } else expand(code)
        if (nextCode < 4096) {
          prefix(nextCode) = prev
          suffix(nextCode) = first.toByte
          // One table position BEHIND the encoder (the lag that makes KwKwK
          // possible), so the width bump mirrors one entry early: after
          // assigning (1<<codeSize)-1, the next read needs codeSize+1 bits.
          if (nextCode + 1 == (1 << codeSize) && codeSize < 12) codeSize += 1
          nextCode += 1
        }
        prev = code
      }
    }
    require(produced == n,
      s"LZW produced $produced of $n pixels")
    IndexStats(w, h, n, sumIdx, nColors, topRowSum)
  }
}
