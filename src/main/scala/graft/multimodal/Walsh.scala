package graft.multimodal

/** Fast Walsh–Hadamard transform — the integer-exact spectral transform
  * (Hadamard/natural ordering): `coef(k) = Σ_i a(i) * (-1)^popcount(i AND k)`.
  *
  * Used by the audio-spectrum operator as the windowed transform over decoded
  * PCM samples. Walsh sequency analysis is a standard DSP tool (audio
  * fingerprinting, fast correlation) with one property the oracle loves:
  * every coefficient is an EXACT integer (basis values are ±1), so the
  * O(n log n) butterfly here and the naive O(n²) closed form in SQL must
  * agree bit-for-bit — no float-rounding escape hatch. Input magnitudes up
  * to 2^15 at n=64 keep every intermediate ≪ 2^63.
  */
object Walsh {

  /** In-place FWHT butterfly. Length must be a power of two. Returns the
    * input array (transformed) for call-site convenience.
    */
  def fwht(a: Array[Long]): Array[Long] = {
    val n = a.length
    require(n > 0 && (n & (n - 1)) == 0, s"FWHT length $n not a power of two")
    var h = 1
    while (h < n) {
      var i = 0
      while (i < n) {
        var j = i
        while (j < i + h) {
          val x = a(j); val y = a(j + h)
          a(j) = x + y
          a(j + h) = x - y
          j += 1
        }
        i += 2 * h
      }
      h *= 2
    }
    a
  }

  /** Reference O(n²) definition — differential-test twin of [[fwht]]. */
  def naive(a: Array[Long]): Array[Long] = {
    val n = a.length
    require(n > 0 && (n & (n - 1)) == 0, s"FWHT length $n not a power of two")
    Array.tabulate(n) { k =>
      var s = 0L
      var i = 0
      while (i < n) {
        s += (if (java.lang.Long.bitCount(i & k) % 2 == 0) a(i) else -a(i))
        i += 1
      }
      s
    }
  }
}
