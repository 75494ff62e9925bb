package graft

import java.io.ByteArrayInputStream

import javax.sound.sampled.{AudioFormat, AudioSystem}

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Multimodal, Wav}

/** G.711 mu-law codec differential: the JDK ships its OWN independent
  * mu-law implementation (javax.sound's ULAW codec), which makes the
  * expansion table cross-checkable against a second engine the same way
  * JpegSpec uses ImageIO — our WAV container must parse under the JDK's
  * reader AND our expansion must match its converter sample-for-sample
  * on all 256 codes. Plus the classic compression laws: expand∘compress
  * identity on codes (modulo the negative-zero 0x7F alias), quantization
  * error bounded by the segment step, monotone magnitude.
  */
class MulawSpec extends AnyFunSuite {

  test("expansion matches javax.sound's independent G.711 decoder on all 256 codes") {
    val codes = Array.tabulate[Byte](256)(i => i.toByte)
    val wav = Wav.encodeMulaw(8000, codes)
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(wav))
    assert(in.getFormat.getEncoding == AudioFormat.Encoding.ULAW,
      s"JDK did not recognize the container as ULAW: ${in.getFormat}")
    val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, false)
    val pcm = AudioSystem.getAudioInputStream(pcmFmt, in)
    val buf = pcm.readAllBytes()
    assert(buf.length == 512, s"expected 256 16-bit samples, got ${buf.length} bytes")
    for (i <- 0 until 256) {
      val jdk = ((buf(2 * i) & 0xff) | (buf(2 * i + 1) << 8)).toShort.toInt
      val ours = Wav.ulaw2linear(i)
      assert(ours == jdk, s"code $i: ours $ours vs JDK $jdk")
    }
  }

  test("compression laws: code identity, bounded quantization error, monotone") {
    // expand -> compress returns the original code for every code except
    // the negative-zero alias 0x7F (it expands to 0, which re-encodes as
    // positive zero 0xFF — the standard's known non-injectivity).
    for (c <- 0 until 256 if c != 0x7f)
      assert(Wav.linear2ulaw(Wav.ulaw2linear(c)) == c,
        s"code $c not a fixed point")
    // Round-trip error over the full PCM16 range is bounded by half the
    // logarithmic segment step (segment s quantizes in steps of 2^(s+3)).
    var pcm = -32768
    while (pcm <= 32767) {
      val rt = Wav.ulaw2linear(Wav.linear2ulaw(pcm))
      val mag = math.min(math.abs(pcm), 32635)
      val err = math.abs(rt - (if (pcm < 0) -mag else mag))
      val seg = {
        var s = 0
        var top = 0xff
        while (mag + 0x84 > top) { s += 1; top = (top << 1) | 0xff }
        s
      }
      assert(err <= (1 << (seg + 3)) / 2,
        s"pcm $pcm round-tripped to $rt (err $err, segment $seg)")
      pcm += 7
    }
    // Expansion is strictly monotone: wire codes 0x80..0xFF decode to
    // strictly DECREASING positive values (0x80 = +32124 ... 0xFF = 0) —
    // a swapped mantissa or exponent field would break the order.
    val pos = (0x80 to 0xff).map(Wav.ulaw2linear)
    assert(pos.zip(pos.tail).forall { case (a, b) => a > b } && pos.last == 0,
      "positive branch not strictly decreasing to 0")
  }

  test("mu-law decode walks the junk chunk and rejects wrong profiles") {
    val text = "hello mu-law world".getBytes("US-ASCII")
    val s = Wav.decodeMulaw(Multimodal.syntheticMulawWav(text))
    assert(s.nSamples == text.length && s.sampleRate == 8000)
    // Alternating wire polarity: even positions are ASCII (sign-clear wire
    // -> negative samples), odd positions are +128 (positive samples).
    assert(s.sumAmp != 0 && s.peak > 0)
    // A PCM16 file is not a mu-law file: loud reject, not garbage stats.
    val pcm = Wav.encode(8000, Array[Short](1, 2, 3))
    intercept[IllegalArgumentException](Wav.decodeMulaw(pcm))
    // And vice versa.
    intercept[IllegalArgumentException](
      Wav.decode(Wav.encodeMulaw(8000, Array[Byte](1, 2, 3))))
  }

  test("query features equal a direct per-sample recomputation") {
    val spark = SparkTestBase.spark
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions.{col, length, octet_length}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val want = docs.map { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val amps = bytes.indices.map { i =>
        val b = bytes(i) & 0xff
        Wav.ulaw2linear(if (i % 2 == 1) (b + 128) & 0xff else b)
      }
      (id, amps.length.toLong, amps.map(math.abs).max.toLong)
    }.toSet
    val got = SparkEntry.queries("mm_ulaw_stats")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    assert(got == want)
  }
}
