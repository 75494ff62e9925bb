package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Adpcm, Multimodal, Wav}

/** IMA ADPCM codec tests: the predictive class has per-sample STATE, so
  * the legs target state tracking — encoder-embeds-decoder round-trip
  * with a committed error bound, a hand-decoded golden block, fact-chunk
  * truncation semantics, and loud rejects on profile violations.
  */
class AdpcmSpec extends AnyFunSuite {

  test("hand-decoded golden block: header sample + first nibbles") {
    // nibbles 3, 8 from state (0, 0): step 7 →
    //  n=3: diff = 7>>3 + 7>>1 + 7>>2 = 0+3+1 = 4 → pred 4, idx 0-1→0
    //  n=8: diff = 7>>3 = 0, sign → pred 4, idx 0-1→0
    val wav = Adpcm.encodeNibbles(8000, Array[Byte](3, 8))
    val s = Adpcm.decode(wav)
    assert(s.nSamples == 3) // header + 2 nibbles
    assert(s.sumAmp == 0 + 4 + 4 && s.peak == 4)
    assert(s.sumSq == 16 + 16)
  }

  test("adaptive step: a run of max-magnitude codes saturates the clamp") {
    // 7 = +max nibble: the step table climbs 8 indices per code, so in a
    // single long block the predictor must hit the +32767 clamp and stay
    // there, never wrap. (blockAlign 24 → 40 nibbles in ONE block; the
    // default 8-byte blocks reset state before the clamp is reachable.)
    val wav = Adpcm.encodeNibbles(8000, Array.fill[Byte](40)(7),
      blockAlign = 24)
    val s = Adpcm.decode(wav)
    assert(s.peak == 32767, s"clamp not reached: peak ${s.peak}")
  }

  test("encoder round-trip: real encode-embeds-decode state tracking") {
    // A smooth full-range sweep the adaptive predictor can follow: two
    // sine periods at 1/4 amplitude plus a ramp.
    val n = 400
    val samples = Array.tabulate[Short](n) { i =>
      (8192 * math.sin(2 * math.Pi * i / 100.0) + (i * 40 - 8000)).toShort
    }
    val decoded = Adpcm.decode(Adpcm.encode(8000, samples))
    assert(decoded.nSamples == n)
    // The decoder must land EXACTLY on the encoder's embedded
    // reconstruction — this sequential replica re-runs the state machine
    // with the encoder's blocking rules (header = verbatim first sample,
    // step index CARRIED across blocks), so it independently checks the
    // byte-level nibble packing, header fields, and block walk.
    val st = new Adpcm.State(0, 0)
    val recon = scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    while (i < n) {
      st.pred = samples(i)
      recon += samples(i).toInt
      i += 1
      var k = 0
      while (k < 8 && i < n) {
        Adpcm.encodeNibble(samples(i), st)
        recon += st.pred
        i += 1
        k += 1
      }
    }
    assert(decoded.sumAmp == recon.map(_.toLong).sum &&
      decoded.sumSq == recon.map(v => v.toLong * v).sum &&
      decoded.peak == recon.map(math.abs).max,
      "decode does not reproduce the encoder's embedded reconstruction")
    // Committed quality bound: RMS reconstruction error under 5% of
    // signal RMS on this signal (measured ~1%; the step tracks the slope).
    val sigRms = math.sqrt(samples.map(s => s.toDouble * s).sum / n)
    val errRms = math.sqrt(samples.zip(recon).map { case (a, b) =>
      (a - b).toDouble * (a - b)
    }.sum / n)
    assert(errRms / sigRms < 0.05,
      s"round-trip error RMS $errRms vs signal RMS $sigRms")
  }

  test("fact chunk truncates final-block padding; rejects honor the profile") {
    // 9 nibbles → 2 blocks; block 2 has 1 real nibble + 7 pad nibbles the
    // fact count must keep undecoded: n_samples = 9 + 2 headers.
    val s = Adpcm.decode(Adpcm.encodeNibbles(8000, Array.fill[Byte](9)(1)))
    assert(s.nSamples == 11)
    // PCM16 and mu-law files are not ADPCM files.
    intercept[IllegalArgumentException](
      Adpcm.decode(Wav.encode(8000, Array[Short](1, 2, 3))))
    intercept[IllegalArgumentException](
      Adpcm.decode(Wav.encodeMulaw(8000, Array[Byte](1, 2, 3))))
    // Corrupt step index (> 88) in a block header: loud reject.
    val wav = Adpcm.encodeNibbles(8000, Array[Byte](1, 2, 3))
    val dataOff = wav.length - 8 // single 8-byte block at the tail
    wav(dataOff + 2) = 100
    intercept[IllegalArgumentException](Adpcm.decode(wav))
    // Truncated fact count vs missing fact: data before fact rejects.
    val noFact = Adpcm.encodeNibbles(8000, Array[Byte](1)).clone()
    noFact(40) = 'j'; noFact(41) = 'u'; noFact(42) = 'n'; noFact(43) = 'k'
    intercept[IllegalArgumentException](Adpcm.decode(noFact))
  }

  test("query features equal a direct sequential recomputation") {
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
      val out = scala.collection.mutable.ArrayBuffer[Int]()
      for (b0 <- bytes.indices by 8) {
        val st = new Adpcm.State(0, 0)
        out += 0 // header sample
        for (i <- b0 until math.min(b0 + 8, bytes.length))
          out += Adpcm.decodeNibble(((bytes(i) & 0xff) + i) % 16, st)
      }
      (id, out.length.toLong, out.map(math.abs).max.toLong,
        out.map(_.toLong).sum)
    }.toSet
    val got = SparkEntry.queries("mm_adpcm_stats")(spark, dir)
      .collect().map { r =>
        // recover the exact sum from the rounded mean is lossy — compare
        // n_samples & peak here; the hash-exact sums are the oracle's job.
        (r.getLong(0), r.getLong(1), r.getLong(4))
      }.toSet
    assert(got == want.map(w => (w._1, w._2, w._3)))
  }
}
