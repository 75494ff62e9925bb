package graft.multimodal

/** Real video-container codec, completing the image/audio/video trio of
  * dependency-free REAL decoders ([[Bmp]] image, [[Wav]]/[[Walsh]] audio,
  * this one video): RIFF AVI with uncompressed 24-bit DIB frames
  * (`'00db'` chunks — the `biCompression = BI_RGB` baseline every AVI
  * tool emits).
  *
  * What makes AVI a genuinely different parse from WAV despite sharing
  * RIFF: chunks NEST. The header lives in `LIST hdrl` (which itself
  * contains `avih` plus a nested `LIST strl` holding the stream header
  * `strh` and format `strf`), and the frames live in `LIST movi`. Files
  * in the wild interleave `JUNK` alignment chunks and trail an `idx1`
  * index; a decoder that assumes fixed offsets mis-reads all of them.
  * This decoder recursively walks the LIST tree, validates `strh`
  * fccType/`strf` BITMAPINFOHEADER against `avih`, skips unknown ids,
  * honors the RIFF odd-size pad byte, and rejects loudly (quarantine
  * lane) on anything that is not the declared format.
  *
  * Each DIB frame payload uses the same scanline layout as [[Bmp]]
  * (bottom-up rows, BGR, 4-byte stride padding) but with NO per-frame
  * file header — the geometry comes from `strf` once, which is exactly
  * why the container-level validation is load-bearing.
  *
  * The sampled decode (`decodeSampled(step)`) is the video-ingest
  * primitive `mm_frame_sample` stubbed with byte slices: every frame's
  * CHUNK HEADER must still be walked (the container is sequential), but
  * the pixel loops of unsampled frames are skipped — which is where the
  * real cost lives.
  */
object Avi {

  /** Per-frame exact channel sums (longs — callers derive means with one
    * rounding step in the query layer, as with [[Bmp.PixelStats]]) plus
    * the frame's 16-bit blockhash perceptual hash — [[Bmp.phash16]]'s
    * 4×4-cell brighter-than-global-mean grid computed on the SAME pixel
    * pass (image-space top-down cells, exact 128-bit
    * cross-multiplication compares), the per-frame near-dup key for
    * video-level dedup.
    */
  final case class FrameStats(frameIdx: Int, sumB: Long, sumG: Long,
      sumR: Long, phash16: Long)

  /** Decoded-container features: geometry from `strf`, the TOTAL frame
    * count from `avih`, and stats for the frames the sampler visited.
    */
  final case class VideoStats(width: Int, height: Int, nFrames: Int,
      frames: Seq[FrameStats])

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

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  private def putCC(b: Array[Byte], off: Int, s: String): Unit = {
    var i = 0
    while (i < 4) { b(off + i) = s.charAt(i).toByte; i += 1 }
  }

  // Same overflow posture as Bmp.MaxDim: reject geometries whose stride
  // arithmetic could wrap before the truncation checks run.
  private val MaxDim: Int = (Int.MaxValue - 3) / 3

  private def stride(width: Int): Int = ((3L * width + 3) / 4 * 4).toInt

  /** Encode top-down BGR frames (each `3*width*height` bytes) as a RIFF
    * AVI: `LIST hdrl (avih, LIST strl (strh, strf))`, an optional
    * odd-sized `JUNK` chunk (forces the pad-byte walk, like
    * [[Wav.encode]]'s junk LIST), `LIST movi` of `'00db'` DIB frames,
    * and a trailing `idx1` the decoder must skip.
    */
  def encode(width: Int, height: Int, frames: Seq[Array[Byte]],
      junkChunk: Boolean = false): Array[Byte] = {
    require(width > 0 && width <= MaxDim && height > 0 && height <= MaxDim,
      s"unsupported geometry ${width}x$height")
    require(frames.nonEmpty, "no frames")
    frames.foreach(f => require(f.length == 3L * width * height,
      s"frame buffer ${f.length} != 3*$width*$height"))
    val st = stride(width)
    val frameSize = st * height
    val junkPayload = 5 // odd on purpose: forces the pad byte
    val junkSize = if (junkChunk) 8 + junkPayload + 1 else 0
    val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    // All size accounting in Long: a huge count of tiny frames would wrap
    // Int arithmetic (n*(8+frameSize), n*16) BEFORE any total check could
    // run, turning the loud reject below into a negative-size allocation.
    val moviSizeL = 4L + frames.size.toLong * (8L + frameSize)
    val idx1SizeL = frames.size.toLong * 16
    val riffSizeL = 4L + (8 + hdrlSize) + junkSize + (8 + moviSizeL) +
      (8 + idx1SizeL)
    // Int.MaxValue - 2 is the JVM max array length: a total 2 bytes past
    // it would pass an Int.MaxValue bound and then die in the allocator
    // (OutOfMemoryError) instead of this loud reject.
    require(8 + riffSizeL <= Int.MaxValue - 2,
      s"video exceeds RIFF Int size fields (${8 + riffSizeL} bytes)")
    val moviSize = moviSizeL.toInt
    val idx1Size = idx1SizeL.toInt
    val riffSize = riffSizeL.toInt
    val out = new Array[Byte](8 + riffSize)
    var p = 0
    putCC(out, p, "RIFF"); putLE(out, p + 4, riffSize, 4); p += 8
    putCC(out, p, "AVI "); p += 4
    // LIST hdrl
    putCC(out, p, "LIST"); putLE(out, p + 4, hdrlSize, 4); p += 8
    putCC(out, p, "hdrl"); p += 4
    //   avih: main header (56-byte payload)
    putCC(out, p, "avih"); putLE(out, p + 4, 56, 4); p += 8
    putLE(out, p, 100000, 4)           // usec/frame (10 fps)
    putLE(out, p + 4, 0, 4)            // max bytes/sec
    putLE(out, p + 8, 0, 4)            // padding granularity
    putLE(out, p + 12, 0x10, 4)        // AVIF_HASINDEX
    putLE(out, p + 16, frames.size, 4) // total frames
    putLE(out, p + 20, 0, 4)           // initial frames
    putLE(out, p + 24, 1, 4)           // streams
    putLE(out, p + 28, frameSize, 4)   // suggested buffer size
    putLE(out, p + 32, width, 4)
    putLE(out, p + 36, height, 4)
    p += 56                            // reserved[4] stays zero
    //   LIST strl
    putCC(out, p, "LIST"); putLE(out, p + 4, 4 + 64 + 48, 4); p += 8
    putCC(out, p, "strl"); p += 4
    //     strh: stream header (56-byte payload)
    putCC(out, p, "strh"); putLE(out, p + 4, 56, 4); p += 8
    putCC(out, p, "vids"); putCC(out, p + 4, "DIB ")
    putLE(out, p + 20, 1, 4)           // scale
    putLE(out, p + 24, 10, 4)          // rate => 10 fps
    putLE(out, p + 32, frames.size, 4) // length in frames
    putLE(out, p + 36, frameSize, 4)   // suggested buffer size
    putLE(out, p + 40, -1, 4)          // quality (default)
    p += 56
    //     strf: BITMAPINFOHEADER (40-byte payload), as in Bmp.encode
    putCC(out, p, "strf"); putLE(out, p + 4, 40, 4); p += 8
    putLE(out, p, 40, 4)
    putLE(out, p + 4, width, 4)
    putLE(out, p + 8, height, 4)       // positive => bottom-up rows
    putLE(out, p + 12, 1, 2)           // planes
    putLE(out, p + 14, 24, 2)          // bits per pixel
    putLE(out, p + 16, 0, 4)           // BI_RGB
    putLE(out, p + 20, frameSize, 4)
    p += 40
    if (junkChunk) {
      putCC(out, p, "JUNK"); putLE(out, p + 4, junkPayload, 4); p += 8
      var i = 0
      while (i < junkPayload) { out(p + i) = 0x5a; i += 1 }
      p += junkPayload + 1             // odd size => mandatory pad byte
    }
    // LIST movi
    putCC(out, p, "LIST"); putLE(out, p + 4, moviSize, 4); p += 8
    val moviFourcc = p // absolute position of the 'movi' list-type fourcc
    putCC(out, p, "movi"); p += 4
    val frameOffsets = new Array[Int](frames.size)
    frames.zipWithIndex.foreach { case (f, idx) =>
      // idx1 offset convention: relative to the 'movi' fourcc (the
      // common of the two interpretations in the wild; decodeIndexed
      // probes both, and AviSpec exercises the absolute variant too).
      frameOffsets(idx) = p - moviFourcc
      putCC(out, p, "00db"); putLE(out, p + 4, frameSize, 4); p += 8
      var y = 0
      while (y < height) {
        // image row y (0 = top) lands at DIB row (height-1-y): bottom-up.
        System.arraycopy(f, 3 * width * y, out,
          p + (height - 1 - y) * st, 3 * width)
        y += 1
      }
      p += frameSize
    }
    // idx1: one 16-byte entry per frame — real muxers append it, so the
    // decoder's unknown-chunk skip is exercised by every encoded file.
    putCC(out, p, "idx1"); putLE(out, p + 4, idx1Size, 4); p += 8
    frames.indices.foreach { idx =>
      putCC(out, p, "00db")
      putLE(out, p + 4, 0x10, 4)       // AVIIF_KEYFRAME
      putLE(out, p + 8, frameOffsets(idx), 4)
      putLE(out, p + 12, frameSize, 4)
      p += 16
    }
    require(p == out.length, s"encoder accounting: wrote $p of ${out.length}")
    out
  }

  private final case class Header(width: Int, height: Int, nFrames: Int)

  /** Walk `LIST hdrl`: validate avih, then the nested `LIST strl`'s
    * strh/strf against it. `off..end` brackets the hdrl PAYLOAD (after
    * the 'hdrl' list type).
    */
  private def parseHdrl(b: Array[Byte], off: Int, end: Int): Header = {
    var p = off
    var avih: Option[(Int, Int, Int)] = None   // (width, height, nFrames)
    var strf: Option[(Int, Int)] = None        // (width, height)
    var sawVids = false
    while (p + 8 <= end) {
      val id = fourcc(b, p)
      val size = getLE(b, p + 4, 4)
      require(size >= 0 && p + 8 + size.toLong <= end,
        s"truncated '$id' chunk")
      if (id == "avih") {
        require(size >= 40, s"avih payload $size too small")
        avih = Some((getLE(b, p + 8 + 32, 4), getLE(b, p + 8 + 36, 4),
          getLE(b, p + 8 + 16, 4)))
      } else if (id == "LIST" && size >= 4 && fourcc(b, p + 8) == "strl") {
        var q = p + 12
        val qEnd = p + 8 + size
        while (q + 8 <= qEnd) {
          val sid = fourcc(b, q)
          val ssz = getLE(b, q + 4, 4)
          require(ssz >= 0 && q + 8 + ssz.toLong <= qEnd,
            s"truncated '$sid' chunk")
          if (sid == "strh") {
            require(ssz >= 8, s"strh payload $ssz too small")
            val fccType = fourcc(b, q + 8)
            require(fccType == "vids", s"unsupported stream type '$fccType'")
            sawVids = true
          } else if (sid == "strf") {
            require(ssz >= 40, s"strf payload $ssz too small")
            val bpp = getLE(b, q + 8 + 14, 2)
            val compression = getLE(b, q + 8 + 16, 4)
            require(bpp == 24, s"unsupported bpp $bpp (only 24-bit DIB)")
            require(compression == 0, s"unsupported compression $compression")
            strf = Some((getLE(b, q + 8 + 4, 4), getLE(b, q + 8 + 8, 4)))
          }
          q += 8 + ssz + (ssz & 1)
        }
      }
      p += 8 + size + (size & 1)
    }
    (avih, strf) match {
      case (Some((aw, ah, nf)), Some((sw, sh))) =>
        require(sawVids, "strl carries no 'vids' stream header")
        require(aw == sw && ah == sh,
          s"avih geometry ${aw}x$ah != strf ${sw}x$sh")
        require(sw > 0 && sw <= MaxDim && sh > 0 && sh <= MaxDim,
          s"unsupported geometry ${sw}x$sh")
        require(nf > 0, s"frame count $nf")
        Header(sw, sh, nf)
      case (None, _) => throw new IllegalArgumentException("missing avih")
      case _ => throw new IllegalArgumentException("missing strf")
    }
  }

  /** Sum one DIB frame's channels; payload layout identical to the BMP
    * pixel array (bottom-up, BGR, stride padding) but headerless.
    */
  private def sumFrame(b: Array[Byte], off: Int, h: Header,
      idx: Int): FrameStats = {
    val st = stride(h.width)
    var sumB = 0L; var sumG = 0L; var sumR = 0L
    val cellSum = new Array[Long](16)
    val cellN = new Array[Long](16)
    var y = 0
    while (y < h.height) {
      val src = off + (h.height - 1 - y) * st
      val blkRow = 4 * (y * 4 / h.height)
      var x = 0
      while (x < h.width) {
        val bb = b(src + 3 * x) & 0xff
        val g = b(src + 3 * x + 1) & 0xff
        val r = b(src + 3 * x + 2) & 0xff
        sumB += bb; sumG += g; sumR += r
        val cell = blkRow + x * 4 / h.width
        cellSum(cell) += bb + g + r
        cellN(cell) += 1
        x += 1
      }
      y += 1
    }
    val totalSum = sumB + sumG + sumR
    val totalN = h.width.toLong * h.height
    var ph = 0L
    var c = 0
    while (c < 16) {
      if (Bmp.productGreater(cellSum(c), totalN, totalSum, cellN(c)))
        ph |= 1L << c
      c += 1
    }
    FrameStats(idx, sumB, sumG, sumR, ph)
  }

  /** Decode with frame sampling: walk every chunk header, but run the
    * pixel loops only for frame indices divisible by `step` — the
    * ingest-side economics of "sample every k-th frame".
    */
  /** Validate the RIFF/AVI preamble and return the payload end offset.
    * All size comparisons here and in the walks are done in Long — a
    * crafted u32 size near Int.MaxValue must hit a loud require, not
    * wrap an Int sum and slip past into an out-of-bounds read.
    */
  private def riffAviEnd(bytes: Array[Byte]): Int = {
    require(bytes.length >= 12 && fourcc(bytes, 0) == "RIFF",
      "not RIFF: bad magic")
    val riffSize = getLE(bytes, 4, 4)
    require(riffSize >= 4 && 8L + riffSize <= bytes.length,
      "truncated RIFF payload")
    require(fourcc(bytes, 8) == "AVI ", "RIFF form is not 'AVI '")
    8 + riffSize
  }

  def decodeSampled(bytes: Array[Byte], step: Int): VideoStats = {
    require(step >= 1, s"step $step")
    val end = riffAviEnd(bytes)
    var p = 12
    var header: Option[Header] = None
    val frames = Seq.newBuilder[FrameStats]
    var frameIdx = 0
    while (p + 8 <= end) {
      val id = fourcc(bytes, p)
      val size = getLE(bytes, p + 4, 4)
      require(size >= 0 && p + 8 + size.toLong <= end,
        s"truncated '$id' chunk")
      if (id == "LIST") {
        require(size >= 4, s"LIST chunk size $size too small")
        fourcc(bytes, p + 8) match {
          case "hdrl" =>
            header = Some(parseHdrl(bytes, p + 12, p + 8 + size))
          case "movi" =>
            val h = header.getOrElse(throw new IllegalArgumentException(
              "LIST movi before LIST hdrl"))
            val frameSize = stride(h.width).toLong * h.height
            var q = p + 12
            val qEnd = p + 8 + size
            while (q + 8 <= qEnd) {
              val fid = fourcc(bytes, q)
              val fsz = getLE(bytes, q + 4, 4)
              require(fsz >= 0 && q + 8 + fsz.toLong <= qEnd,
                s"truncated '$fid' chunk")
              if (fid == "00db" || fid == "00dc") {
                require(fid == "00db", "compressed frame in BI_RGB stream")
                require(fsz == frameSize,
                  s"frame $frameIdx payload $fsz != $frameSize")
                if (frameIdx % step == 0)
                  frames += sumFrame(bytes, q + 8, h, frameIdx)
                frameIdx += 1
              } // anything else (rec  lists, audio chunks): skip
              q += 8 + fsz + (fsz & 1)
            }
          case _ => () // unknown LIST: skip
        }
      } // non-LIST top-level chunk (JUNK, idx1): skip
      p += 8 + size + (size & 1)
    }
    val h = header.getOrElse(
      throw new IllegalArgumentException("missing LIST hdrl"))
    require(frameIdx == h.nFrames,
      s"movi carries $frameIdx frames, avih declares ${h.nFrames}")
    VideoStats(h.width, h.height, h.nFrames, frames.result())
  }

  /** Full decode: every frame. */
  def decode(bytes: Array[Byte]): VideoStats = decodeSampled(bytes, 1)

  /** Index-SEEK decode: resolve sampled frames through the `idx1` index
    * instead of walking every `movi` chunk header. The honest economics:
    * O(total frames) in 16-byte INDEX entries — four integer reads per
    * entry, sequential, allocation-free, needed to validate entry ids
    * and offset monotonicity — but O(sampled frames) in frame-chunk
    * validation and pixel work, which is where the cost lives when a
    * "payload" is an hour of video and the sampler wants one frame a
    * minute ([[decodeSampled]] pays a header parse AND bounds walk per
    * frame chunk because the container is sequential without the index;
    * an index entry is 16 bytes vs a frame chunk's megabytes).
    *
    * Trust moves from the walk to the index, so the index itself is
    * validated: every entry must carry the `'00db'` id, entry offsets
    * must be STRICTLY INCREASING (a duplicate or reordered index — each
    * entry individually plausible — would otherwise relabel one frame's
    * pixels as many), the entry count must equal avih's declared frame
    * count, and every entry USED must point at a `'00db'` header whose
    * size matches the strf geometry, inside `movi`. Offsets in the wild
    * are EITHER relative to the `'movi'` fourcc or absolute file offsets
    * (the spec ambiguity every AVI reader ships a workaround for) —
    * detected once on the first entry by probing both interpretations,
    * then pinned for the rest of the file.
    */
  def decodeIndexed(bytes: Array[Byte], step: Int): VideoStats = {
    require(step >= 1, s"step $step")
    val end = riffAviEnd(bytes)
    var p = 12
    var header: Option[Header] = None
    var moviFourcc = -1 // absolute position of the 'movi' list-type fourcc
    var moviEnd = -1
    var idx1Off = -1
    var idx1Size = 0
    while (p + 8 <= end) {
      val id = fourcc(bytes, p)
      val size = getLE(bytes, p + 4, 4)
      require(size >= 0 && p + 8 + size.toLong <= end,
        s"truncated '$id' chunk")
      if (id == "LIST") {
        require(size >= 4, s"LIST chunk size $size too small")
        fourcc(bytes, p + 8) match {
          case "hdrl" =>
            header = Some(parseHdrl(bytes, p + 12, p + 8 + size))
          case "movi" => moviFourcc = p + 8; moviEnd = p + 8 + size
          case _ => ()
        }
      } else if (id == "idx1") { idx1Off = p + 8; idx1Size = size }
      p += 8 + size + (size & 1)
    }
    val h = header.getOrElse(
      throw new IllegalArgumentException("missing LIST hdrl"))
    require(moviFourcc >= 0, "missing LIST movi")
    require(idx1Off >= 0, "missing idx1 index (sequential decode only)")
    require(idx1Size % 16 == 0, s"idx1 size $idx1Size not entry-aligned")
    val nEntries = idx1Size / 16
    require(nEntries == h.nFrames,
      s"idx1 carries $nEntries entries, avih declares ${h.nFrames}")
    val frameSize = stride(h.width).toLong * h.height
    // '00db' id check without a String allocation per entry.
    def isFrameId(at: Int): Boolean =
      bytes(at) == '0' && bytes(at + 1) == '0' &&
        bytes(at + 2) == 'd' && bytes(at + 3) == 'b'
    // A frame chunk resolved at `pos` must look like one, wherever the
    // index pointed: inside movi, '00db' id, strf-consistent size. All
    // bounds in Long — a crafted offset near Int.MaxValue must fail a
    // range check here, not wrap and index out of bounds.
    def validFrameAt(pos: Long): Boolean =
      pos >= moviFourcc + 4L && pos + 8 + frameSize <= moviEnd &&
        isFrameId(pos.toInt) && getLE(bytes, pos.toInt + 4, 4) == frameSize
    // Offset-convention probe on entry 0 (movi-relative wins ties: the
    // two interpretations only coincide when moviFourcc == 0, impossible
    // inside a RIFF).
    val off0 = getLE(bytes, idx1Off + 8, 4)
    val relative =
      if (validFrameAt(moviFourcc.toLong + off0)) true
      else if (validFrameAt(off0.toLong)) false
      else throw new IllegalArgumentException(
        s"idx1 entry 0 offset $off0 resolves to no frame chunk under " +
          "either the movi-relative or absolute convention")
    val frames = Seq.newBuilder[FrameStats]
    var lastPos = Long.MinValue
    var i = 0
    while (i < nEntries) {
      val e = idx1Off + 16 * i
      require(isFrameId(e),
        s"idx1 entry $i id '${fourcc(bytes, e)}' is not a video frame")
      val off = getLE(bytes, e + 8, 4)
      val pos = if (relative) moviFourcc.toLong + off else off.toLong
      require(pos > lastPos,
        s"idx1 entry $i offset $off not strictly increasing — duplicate " +
          "or reordered index entries would relabel frames")
      lastPos = pos
      if (i % step == 0) {
        require(validFrameAt(pos),
          s"idx1 entry $i offset $off resolves to no frame chunk")
        frames += sumFrame(bytes, pos.toInt + 8, h, i)
      }
      i += 1
    }
    VideoStats(h.width, h.height, h.nFrames, frames.result())
  }
}
