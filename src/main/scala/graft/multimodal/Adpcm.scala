package graft.multimodal

/** Real PREDICTIVE audio codec: IMA/DVI ADPCM inside RIFF/WAVE (format
  * tag 0x11) — the adaptive differential class the repo's codec taxonomy
  * still lacked (entropy: GIF LZW + JPEG Huffman; transform: JPEG DCT +
  * Walsh; companding: G.711 mu-law; containers: RIFF walks). Each 4-bit
  * code is a QUANTIZED PREDICTION ERROR: the decoder carries per-block
  * state (predictor, step index), reconstructs `pred += ±diff(step,
  * nibble)` and adapts the step size through the standard 89-entry
  * table — so a single mis-decoded nibble corrupts every later sample
  * of its block, which is exactly what makes the stats oracle-sensitive.
  *
  * Container profile implemented (the canonical mono layout): extended
  * `fmt ` chunk (cbSize=2, samplesPerBlock), a `fact` chunk carrying the
  * true sample count (the REAL mechanism by which decoders know where
  * the final block's padding nibbles end), and fixed-size blocks of
  * `[predictor int16 LE, stepIndex u8, reserved u8, data bytes]` with
  * the LOW nibble of each data byte first. The block header's predictor
  * IS the block's first output sample.
  */
object Adpcm {

  /** The standard IMA step-size table (89 entries). */
  val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Step-index adaptation per nibble value. */
  val IndexTable: Array[Int] = Array(
    -1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** Mutable decoder state: one (predictor, step index) pair per block. */
  final class State(var pred: Int, var idx: Int)

  /** Decode one 4-bit code against `st`, returning the reconstructed
    * sample (and advancing the state) — the core predictive step.
    */
  def decodeNibble(n: Int, st: State): Int = {
    val step = StepTable(st.idx)
    var diff = step >> 3
    if ((n & 4) != 0) diff += step
    if ((n & 2) != 0) diff += step >> 1
    if ((n & 1) != 0) diff += step >> 2
    val p = if ((n & 8) != 0) st.pred - diff else st.pred + diff
    st.pred = math.max(-32768, math.min(32767, p))
    st.idx = math.max(0, math.min(88, st.idx + IndexTable(n)))
    st.pred
  }

  /** Encode one PCM16 sample against `st`, returning the 4-bit code and
    * advancing the state exactly as the decoder will (the encoder embeds
    * the decoder — mismatched state tracking is THE classic ADPCM bug).
    */
  def encodeNibble(sample: Int, st: State): Int = {
    val step = StepTable(st.idx)
    var delta = sample - st.pred
    var n = 0
    if (delta < 0) { n = 8; delta = -delta }
    if (delta >= step) { n |= 4; delta -= step }
    if (delta >= (step >> 1)) { n |= 2; delta -= step >> 1 }
    if (delta >= (step >> 2)) n |= 1
    decodeNibble(n, st)
    n
  }

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

  /** Nibbles per full block for a given blockAlign (4-byte header, 2
    * codes per data byte); samplesPerBlock = 1 header sample + these.
    */
  private def nibblesPerBlock(blockAlign: Int): Int = 2 * (blockAlign - 4)

  /** Build the RIFF/WAVE container around pre-built blocks. */
  private def container(sampleRate: Int, totalSamples: Int,
      blockAlign: Int, blocks: Array[Byte]): Array[Byte] = {
    val riffSize = 4 + (8 + 20) + (8 + 4) + 8 + blocks.length
    val out = new Array[Byte](8 + riffSize)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putLE(out, 4, riffSize, 4)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putLE(out, 16, 20, 4)              // extended fmt payload
    putLE(out, 20, 0x11, 2)            // format 0x11 = IMA ADPCM
    putLE(out, 22, 1, 2)               // mono
    putLE(out, 24, sampleRate, 4)
    // byte rate ~= rate * blockAlign / samplesPerBlock (informational)
    putLE(out, 28, sampleRate * blockAlign / (1 + nibblesPerBlock(blockAlign)), 4)
    putLE(out, 32, blockAlign, 2)
    putLE(out, 34, 4, 2)               // bits per (coded) sample
    putLE(out, 36, 2, 2)               // cbSize
    putLE(out, 38, 1 + nibblesPerBlock(blockAlign), 2) // samplesPerBlock
    out(40) = 'f'; out(41) = 'a'; out(42) = 'c'; out(43) = 't'
    putLE(out, 44, 4, 4)
    putLE(out, 48, totalSamples, 4)    // true decoded sample count
    out(52) = 'd'; out(53) = 'a'; out(54) = 't'; out(55) = 'a'
    putLE(out, 56, blocks.length, 4)
    System.arraycopy(blocks, 0, out, 60, blocks.length)
    out
  }

  /** Encode PCM16 samples as real IMA ADPCM: per block the header carries
    * the first sample verbatim (predictor) plus the CARRIED step index,
    * and the remaining samples quantize as prediction-error nibbles.
    */
  def encode(sampleRate: Int, samples: Array[Short],
      blockAlign: Int = 8): Array[Byte] = {
    require(samples.nonEmpty, "no samples")
    require(blockAlign >= 5, s"blockAlign $blockAlign below header+1")
    val perBlock = 1 + nibblesPerBlock(blockAlign)
    val nBlocks = (samples.length + perBlock - 1) / perBlock
    val blocks = new Array[Byte](nBlocks * blockAlign)
    val st = new State(0, 0)
    var s = 0
    var b = 0
    while (b < nBlocks) {
      val off = b * blockAlign
      st.pred = samples(s)
      putLE(blocks, off, samples(s) & 0xffff, 2)
      blocks(off + 2) = st.idx.toByte
      blocks(off + 3) = 0
      s += 1
      var k = 0
      while (k < nibblesPerBlock(blockAlign) && s < samples.length) {
        val n = encodeNibble(samples(s), st)
        if (k % 2 == 0) blocks(off + 4 + k / 2) = n.toByte
        else blocks(off + 4 + k / 2) =
          (blocks(off + 4 + k / 2) | (n << 4)).toByte
        s += 1
        k += 1
      }
      b += 1
    }
    container(sampleRate, samples.length, blockAlign, blocks)
  }

  /** Encode a raw nibble stream (synthesis path): every block header is
    * predictor 0 / index 0, the final block zero-padded to blockAlign —
    * the `fact` count makes the padding unreachable to the decoder.
    */
  def encodeNibbles(sampleRate: Int, nibbles: Array[Byte],
      blockAlign: Int = 8): Array[Byte] = {
    require(nibbles.nonEmpty, "no nibbles")
    val per = nibblesPerBlock(blockAlign)
    val nBlocks = (nibbles.length + per - 1) / per
    val blocks = new Array[Byte](nBlocks * blockAlign)
    var i = 0
    while (i < nibbles.length) {
      val off = (i / per) * blockAlign + 4
      val k = i % per
      val n = nibbles(i) & 0x0f
      if (k % 2 == 0) blocks(off + k / 2) = n.toByte
      else blocks(off + k / 2) = (blocks(off + k / 2) | (n << 4)).toByte
      i += 1
    }
    container(sampleRate, nibbles.length + nBlocks, blockAlign, blocks)
  }

  /** Decode an IMA ADPCM mono RIFF/WAVE to amplitude statistics over the
    * reconstructed PCM16 samples. Walks the chunk list, parses the
    * EXTENDED fmt (cbSize + samplesPerBlock — cross-validated against
    * blockAlign), honors the `fact` sample count (stopping before the
    * final block's padding nibbles), and loud-rejects anything off the
    * declared profile.
    */
  def decode(bytes: Array[Byte]): Wav.AudioStats = {
    require(bytes.length >= 60 && ascii(bytes, 0) == "RIFF" &&
      ascii(bytes, 8) == "WAVE", "not a WAV: bad RIFF/WAVE magic")
    var off = 12
    var sampleRate = -1
    var blockAlign = -1
    var samplesPerBlock = -1
    var factSamples = -1
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= bytes.length && dataOff < 0) {
      val id = ascii(bytes, off)
      val size = getLE(bytes, off + 4, 4)
      require(size >= 0 && off + 8 + size.toLong <= bytes.length,
        s"truncated chunk '$id'")
      id match {
        case "fmt " =>
          require(size >= 20, "ADPCM fmt chunk needs the extension fields")
          val format = getLE(bytes, off + 8, 2)
          require(format == 0x11,
            s"unsupported audio format $format (want 0x11 IMA ADPCM)")
          require(getLE(bytes, off + 10, 2) == 1, "mono only")
          require(getLE(bytes, off + 22, 2) == 4,
            "IMA ADPCM codes are 4 bits")
          sampleRate = getLE(bytes, off + 12, 4)
          require(sampleRate > 0, s"bad sample rate $sampleRate")
          blockAlign = getLE(bytes, off + 20, 2)
          require(blockAlign >= 5, s"blockAlign $blockAlign below header+1")
          require(getLE(bytes, off + 24, 2) >= 2, "missing cbSize")
          samplesPerBlock = getLE(bytes, off + 26, 2)
          require(samplesPerBlock == 1 + nibblesPerBlock(blockAlign),
            s"samplesPerBlock $samplesPerBlock inconsistent with " +
              s"blockAlign $blockAlign")
        case "fact" =>
          require(size >= 4, "fact chunk too small")
          factSamples = getLE(bytes, off + 8, 4)
          require(factSamples >= 0, "negative fact sample count")
        case "data" =>
          require(sampleRate > 0, "data chunk before fmt")
          require(factSamples >= 0, "data chunk before fact (ADPCM needs " +
            "the true sample count)")
          require(size % blockAlign == 0,
            s"data size $size not a multiple of blockAlign $blockAlign")
          dataOff = off + 8
          dataLen = size
        case _ => // LIST/JUNK/...: skip
      }
      off += 8 + size + (size & 1)
    }
    require(dataOff >= 0, "no data chunk")
    val nBlocks = dataLen / blockAlign
    require(factSamples <= nBlocks.toLong * samplesPerBlock,
      s"fact count $factSamples exceeds block capacity")
    var sumAmp = 0L; var sumSq = 0L; var peak = 0
    var emitted = 0
    var b = 0
    while (b < nBlocks && emitted < factSamples) {
      val boff = dataOff + b * blockAlign
      val st = new State(
        ((bytes(boff) & 0xff) | (bytes(boff + 1) << 8)).toShort.toInt,
        bytes(boff + 2) & 0xff)
      require(st.idx <= 88, s"block $b step index ${st.idx} out of range")
      // Header predictor is the block's first sample.
      var s = st.pred
      var k = -1
      while (k < nibblesPerBlock(blockAlign) && emitted < factSamples) {
        if (k >= 0) {
          val byte = bytes(boff + 4 + k / 2) & 0xff
          s = decodeNibble(if (k % 2 == 0) byte & 0x0f else byte >> 4, st)
        }
        sumAmp += s
        sumSq += s.toLong * s
        val a = math.abs(s)
        if (a > peak) peak = a
        emitted += 1
        k += 1
      }
      b += 1
    }
    require(emitted == factSamples,
      s"data exhausted at $emitted of $factSamples samples")
    Wav.AudioStats(factSamples.toLong, sampleRate, sumAmp, sumSq, peak)
  }
}
