package graft.functions

/** The single UTF-8 code-point decode step shared by [[RollingHash31]] and
  * [[CdcCuts]]. Both expressions consume code points straight off
  * UTF8String bytes (no intermediate String/char[] copy); keeping the
  * decode in ONE place means the rolling hash and the CDC chunk
  * boundaries can never silently diverge on a decoder fix — exactly what
  * almost happened when the invalid-lead-byte handling had to be patched
  * in two copies in lockstep.
  *
  * Packed return (no allocation in the per-character hot loop; the JVM
  * inlines the static call): high 32 bits = byte length consumed, low 32
  * bits = code point.
  */
object Utf8Decode {

  /** Decode the code point whose lead byte is at `i`. */
  def step(bytes: Array[Byte], i: Int): Long = {
    val b0 = bytes(i) & 0xFF
    var cp = 0
    var len = 1
    if (b0 < 0x80) { cp = b0 }
    else if ((b0 & 0xE0) == 0xC0) { cp = b0 & 0x1F; len = 2 }
    else if ((b0 & 0xF0) == 0xE0) { cp = b0 & 0x0F; len = 3 }
    else if ((b0 & 0xF8) == 0xF0) { cp = b0 & 0x07; len = 4 }
    // Not a valid lead byte (stray continuation 0x80-0xBF or 0xF8-0xFF):
    // consume exactly one byte, mirroring String.codePointAt's per-char
    // replacement behavior, instead of silently swallowing up to 3
    // following bytes as a bogus 4-byte sequence. Unreachable from valid
    // Spark UTF8String data; defensive only.
    else { cp = b0; len = 1 }
    var j = 1
    while (j < len && i + j < bytes.length) {
      cp = (cp << 6) | (bytes(i + j) & 0x3F)
      j += 1
    }
    (len.toLong << 32) | (cp.toLong & 0xFFFFFFFFL)
  }

  /** Byte length consumed, from a [[step]] result. */
  @inline def len(packed: Long): Int = (packed >>> 32).toInt

  /** Decoded code point, from a [[step]] result. */
  @inline def cp(packed: Long): Int = packed.toInt
}
