package graft.multimodal

/** Real audio codec for the second dependency-free format: RIFF/WAVE with
  * 16-bit little-endian PCM. Like [[Bmp]], the decode does the actual byte
  * work an audio ingest stage does — and the load-bearing detail here is
  * CHUNK WALKING: a real WAV is a sequence of `[id(4), size(4 LE), data,
  * pad-to-even]` chunks, and files in the wild carry LIST/INFO/fact chunks
  * between `fmt ` and `data`. A naive offset-44 reader (the canonical-
  * header shortcut) mis-reads every such file; this decoder walks chunks,
  * skips unknown ids, honors the odd-size pad byte, and validates the
  * format tag before trusting a single sample.
  */
object Wav {

  /** Decoded-audio features. Amplitude sums stay exact longs (sumAmp is
    * the signed sample sum, sumSq the sum of squares) so callers derive
    * mean/RMS with one rounding step in the query layer.
    */
  final case class AudioStats(nSamples: Long, sampleRate: Int,
      sumAmp: Long, sumSq: Long, peak: Int)

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

  private def ascii(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Encode mono PCM16 samples as a RIFF/WAVE file. `junkChunk` inserts an
    * odd-sized LIST chunk (plus its mandatory pad byte) between `fmt ` and
    * `data`, so round-trips exercise the chunk walk, not just the
    * canonical 44-byte layout.
    */
  def encode(sampleRate: Int, samples: Array[Short],
      junkChunk: Boolean = false): Array[Byte] = {
    // Same loud-reject contract as decode: above ~1Gi samples the Int size
    // fields wrap negative and the failure would be an opaque
    // NegativeArraySizeException instead of this message.
    require(samples.length <= (Int.MaxValue - 100) / 2,
      s"sample count ${samples.length} exceeds RIFF Int size fields")
    val dataSize = 2 * samples.length
    val junkPayload = 7 // odd on purpose: forces the pad byte
    val junkSize = if (junkChunk) 8 + junkPayload + 1 else 0
    val riffSize = 4 + 24 + junkSize + 8 + dataSize
    val out = new Array[Byte](8 + riffSize)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putLE(out, 4, riffSize, 4)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    // fmt chunk (PCM16 mono)
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putLE(out, 16, 16, 4)            // fmt payload size
    putLE(out, 20, 1, 2)             // audio format 1 = PCM
    putLE(out, 22, 1, 2)             // channels = 1
    putLE(out, 24, sampleRate, 4)
    putLE(out, 28, sampleRate * 2, 4) // byte rate
    putLE(out, 32, 2, 2)             // block align
    putLE(out, 34, 16, 2)           // bits per sample
    var off = 36
    if (junkChunk) {
      out(off) = 'L'; out(off + 1) = 'I'; out(off + 2) = 'S'; out(off + 3) = 'T'
      putLE(out, off + 4, junkPayload, 4)
      var i = 0
      while (i < junkPayload) { out(off + 8 + i) = (0x5a + i).toByte; i += 1 }
      off += 8 + junkPayload + 1 // +1: odd chunk pads to even
    }
    out(off) = 'd'; out(off + 1) = 'a'; out(off + 2) = 't'; out(off + 3) = 'a'
    putLE(out, off + 4, dataSize, 4)
    var i = 0
    while (i < samples.length) {
      putLE(out, off + 8 + 2 * i, samples(i) & 0xffff, 2)
      i += 1
    }
    out
  }

  /** The shared chunk walk: validates RIFF/WAVE magic, locates `fmt ` and
    * `data`, validates the mono format against the caller's expected
    * format tag + bit depth (1/16 = PCM16, 7/8 = G.711 mu-law). Returns
    * `(sampleRate, dataOff, dataLen)`.
    */
  private def walkChunks(bytes: Array[Byte], wantFormat: Int = 1,
      wantBits: Int = 16): (Int, Int, Int) = {
    require(bytes.length >= 44 && ascii(bytes, 0) == "RIFF" &&
      ascii(bytes, 8) == "WAVE", "not a WAV: bad RIFF/WAVE magic")
    var off = 12
    var sampleRate = -1
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= bytes.length && (sampleRate < 0 || dataOff < 0)) {
      val id = ascii(bytes, off)
      val size = getLE(bytes, off + 4, 4)
      require(size >= 0 && off + 8 + size.toLong <= bytes.length,
        s"truncated chunk '$id'")
      id match {
        case "fmt " =>
          require(size >= 16, "fmt chunk too small")
          val format = getLE(bytes, off + 8, 2)
          val channels = getLE(bytes, off + 10, 2)
          val bits = getLE(bytes, off + 22, 2)
          require(format == wantFormat,
            s"unsupported audio format $format (want $wantFormat)")
          require(channels == 1, s"unsupported channel count $channels")
          require(bits == wantBits,
            s"unsupported bit depth $bits (want $wantBits)")
          sampleRate = getLE(bytes, off + 12, 4)
          require(sampleRate > 0, s"bad sample rate $sampleRate")
        case "data" =>
          require(sampleRate > 0, "data chunk before fmt")
          require(size % (wantBits / 8) == 0,
            s"data size $size not a multiple of the sample width")
          dataOff = off + 8
          dataLen = size
        case _ => // LIST/INFO/fact/...: skip
      }
      off += 8 + size + (size & 1) // odd chunks carry a pad byte
    }
    require(dataOff >= 0, "no data chunk")
    (sampleRate, dataOff, dataLen)
  }

  /** Sign-extend the 16-bit LE sample at byte offset `i`. */
  @inline private def sampleAt(bytes: Array[Byte], i: Int): Int =
    ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort.toInt

  /** Decode a PCM16 mono RIFF/WAVE file to amplitude statistics, walking
    * the chunk list. Throws on anything that isn't the declared format —
    * loud rejects, never silently wrong features.
    */
  def decode(bytes: Array[Byte]): AudioStats = {
    val (sampleRate, dataOff, dataLen) = walkChunks(bytes)
    var sumAmp = 0L; var sumSq = 0L; var peak = 0
    var i = 0
    while (i < dataLen) {
      val s = sampleAt(bytes, dataOff + i)
      sumAmp += s
      sumSq += s.toLong * s
      val a = math.abs(s)
      if (a > peak) peak = a
      i += 2
    }
    AudioStats(dataLen / 2, sampleRate, sumAmp, sumSq, peak)
  }

  /** Decode the leading `maxSamples` PCM16 samples (same chunk walk and
    * format validation as [[decode]]) — the windowed-read path a spectral
    * stage uses: it never needs the whole stream in memory, just the
    * analysis window.
    */
  def decodeWindow(bytes: Array[Byte], maxSamples: Int): (Int, Array[Int]) = {
    val (sampleRate, dataOff, dataLen) = walkChunks(bytes)
    val n = math.min(maxSamples, dataLen / 2)
    val out = new Array[Int](n)
    var i = 0
    while (i < n) { out(i) = sampleAt(bytes, dataOff + 2 * i); i += 1 }
    (sampleRate, out)
  }

  // --- G.711 mu-law (the COMPANDING codec class: logarithmic 8-bit
  // telephony samples; ITU-T G.711, the format tag-7 WAVE profile).
  // Expansion/compression follow the classic public-domain formulation
  // (Sun g711.c): BIAS 0x84 = 132, 4-bit mantissa, 3-bit exponent,
  // one's-complement wire form.

  /** Expand one 8-bit mu-law code (wire form) to its linear PCM16 value. */
  def ulaw2linear(code: Int): Int = {
    val u = (~code) & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u >> 4) & 7)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** Compress one linear PCM16 value to its 8-bit mu-law wire code —
    * the encode direction, used by round-trip tests and the synthetic
    * payload builder's differential legs.
    */
  def linear2ulaw(pcm: Int): Int = {
    require(pcm >= -32768 && pcm <= 32767, s"PCM16 out of range: $pcm")
    val sign = if (pcm < 0) 0x80 else 0
    var mag = math.min(if (pcm < 0) -pcm else pcm, 32635) + 0x84
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (mag & mask) == 0) { exp -= 1; mask >>= 1 }
    val mant = (mag >> (exp + 3)) & 0x0f
    (~(sign | (exp << 4) | mant)) & 0xff
  }

  /** Encode mono mu-law codes as a RIFF/WAVE file (format tag 7, 8-bit
    * samples, blockAlign 1). Same junk-chunk knob as [[encode]].
    */
  def encodeMulaw(sampleRate: Int, codes: Array[Byte],
      junkChunk: Boolean = false): Array[Byte] = {
    require(codes.length <= Int.MaxValue - 100,
      s"sample count ${codes.length} exceeds RIFF Int size fields")
    val junkPayload = 7
    val junkSize = if (junkChunk) 8 + junkPayload + 1 else 0
    val riffSize = 4 + 24 + junkSize + 8 + codes.length
    val out = new Array[Byte](8 + riffSize)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putLE(out, 4, riffSize, 4)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putLE(out, 16, 16, 4)            // fmt payload size
    putLE(out, 20, 7, 2)             // audio format 7 = mu-law
    putLE(out, 22, 1, 2)             // channels = 1
    putLE(out, 24, sampleRate, 4)
    putLE(out, 28, sampleRate, 4)    // byte rate (1 byte/sample)
    putLE(out, 32, 1, 2)             // block align
    putLE(out, 34, 8, 2)             // bits per sample
    var off = 36
    if (junkChunk) {
      out(off) = 'L'; out(off + 1) = 'I'; out(off + 2) = 'S'; out(off + 3) = 'T'
      putLE(out, off + 4, junkPayload, 4)
      var i = 0
      while (i < junkPayload) { out(off + 8 + i) = (0x5a + i).toByte; i += 1 }
      off += 8 + junkPayload + 1
    }
    out(off) = 'd'; out(off + 1) = 'a'; out(off + 2) = 't'; out(off + 3) = 'a'
    putLE(out, off + 4, codes.length, 4)
    System.arraycopy(codes, 0, out, off + 8, codes.length)
    out
  }

  /** Decode a mu-law mono RIFF/WAVE file to amplitude statistics over the
    * EXPANDED linear samples — same chunk walk and loud-reject contract
    * as [[decode]], different sample profile (format 7, 8-bit).
    */
  def decodeMulaw(bytes: Array[Byte]): AudioStats = {
    val (sampleRate, dataOff, dataLen) =
      walkChunks(bytes, wantFormat = 7, wantBits = 8)
    var sumAmp = 0L; var sumSq = 0L; var peak = 0
    var i = 0
    while (i < dataLen) {
      val s = ulaw2linear(bytes(dataOff + i) & 0xff)
      sumAmp += s
      sumSq += s.toLong * s
      val a = math.abs(s)
      if (a > peak) peak = a
      i += 1
    }
    AudioStats(dataLen.toLong, sampleRate, sumAmp, sumSq, peak)
  }
}
