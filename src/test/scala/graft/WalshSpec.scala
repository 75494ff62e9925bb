package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Multimodal, Walsh, Wav}

/** The audio-spectrum stack: FWHT butterfly vs the naive O(n²) definition
  * (the same closed form the DuckDB oracle runs), Parseval's identity,
  * the windowed WAV decode, and the Spark-side feature extraction.
  */
class WalshSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  test("fwht matches the naive O(n^2) definition on seeded random inputs") {
    val rnd = new scala.util.Random(42 + SparkTestBase.stressSeed)
    for (n <- Seq(1, 2, 8, 64); _ <- 1 to 20) {
      val a = Array.fill(n)((rnd.nextInt(65536) - 32768).toLong)
      assert(Walsh.fwht(a.clone()).toSeq == Walsh.naive(a).toSeq, s"n=$n")
    }
    intercept[IllegalArgumentException](Walsh.fwht(new Array[Long](3)))
    intercept[IllegalArgumentException](Walsh.fwht(new Array[Long](0)))
  }

  test("known transforms: impulse, constant, alternating") {
    // Impulse at 0 spreads evenly; a constant concentrates in DC; the
    // fastest alternation concentrates in the highest sequency k = n-1.
    val impulse = Array(7L, 0L, 0L, 0L)
    assert(Walsh.fwht(impulse.clone()).toSeq == Seq(7L, 7L, 7L, 7L))
    val const = Array(3L, 3L, 3L, 3L)
    assert(Walsh.fwht(const.clone()).toSeq == Seq(12L, 0L, 0L, 0L))
    val alt = Array(5L, -5L, 5L, -5L)
    // coef(k) = Σ a(i)(-1)^popcount(i&k): only k=1 (the LSB pattern) survives.
    assert(Walsh.fwht(alt.clone()).toSeq == Seq(0L, 20L, 0L, 0L))
  }

  test("Parseval: spectral energy is n times sample energy") {
    val rnd = new scala.util.Random(7 + SparkTestBase.stressSeed)
    for (_ <- 1 to 10) {
      val a = Array.fill(64)((rnd.nextInt(65536) - 32768).toLong)
      val sampleEnergy = a.map(x => x * x).sum
      val coefEnergy = Walsh.fwht(a.clone()).map(x => x * x).sum
      assert(coefEnergy == 64L * sampleEnergy)
    }
  }

  test("decodeWindow reads the leading samples through the chunk walk") {
    val samples = Array.tabulate(100)(i => ((i * 913 - 40000) % 32768).toShort)
    for (junk <- Seq(false, true)) {
      val bytes = Wav.encode(8000, samples, junkChunk = junk)
      val (rate, w) = Wav.decodeWindow(bytes, 64)
      assert(rate == 8000 && w.length == 64)
      assert(w.toSeq == samples.take(64).map(_.toInt).toSeq)
      // Window longer than the stream: whole stream, no padding invented.
      val (_, all) = Wav.decodeWindow(bytes, 1000)
      assert(all.toSeq == samples.map(_.toInt).toSeq)
    }
    // Same loud-reject contract as decode.
    val good = Wav.encode(8000, samples)
    val bad = good.clone(); bad(0) = 'X'
    intercept[IllegalArgumentException](Wav.decodeWindow(bad, 64))
  }

  test("audioSpectrum features match a per-doc closed-form recomputation") {
    val feats = Multimodal.audioSpectrum(spark, docs).collect()
      .map(f => f.doc_id -> f).toMap
    assert(feats.nonEmpty)
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, text) =>
      val b = text.getBytes("UTF-8")
      if (b.nonEmpty && b.length == text.length) {
        val n = math.min(64, b.length)
        val a = new Array[Long](64)
        for (i <- 0 until n) a(i) = (b(i) & 0xff) * 257L - 32768L
        val c = Walsh.naive(a)
        val energy = c.map(x => x * x).sum
        val bestK = (1 until 64).minBy(k => (-math.abs(c(k)), k))
        val f = feats(id)
        assert(f.n_used == n && f.dc == c(0) && f.energy == energy)
        assert(f.dominant_k == bestK && f.dominant_coef == c(bestK), s"doc $id")
      }
    }
  }

  private def signFp(coefs: Array[Long]): Long = {
    var fp = 0L
    for (k <- 0 until 64) if (coefs(k) > 0) fp |= 1L << k
    fp
  }

  test("audioFingerprints match the closed-form sign-of-coefficient recomputation") {
    val fps = Multimodal.audioFingerprints(spark, docs).collect().toMap
    assert(fps.nonEmpty)
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, text) =>
      val b = text.getBytes("UTF-8")
      if (b.nonEmpty && b.length == text.length) {
        val a = new Array[Long](64)
        for (i <- 0 until math.min(64, b.length))
          a(i) = (b(i) & 0xff) * 257L - 32768L
        assert(fps(id) == signFp(Walsh.naive(a)), s"doc $id")
      }
    }
  }

  test("planted spectral edits: Hamming tracks sign flips, pigeonhole catches them") {
    // Build the sample window as the FWHT of a chosen sign pattern C with
    // margin ±8: fwht is self-inverse up to n, so coefficients come out as
    // 64·C — every sign is strong (|coef| = 512), and flipping exactly k
    // entries of C flips exactly k fingerprint bits. The audio analog of
    // MultimodalSpec's planted-visual-near-dup leg: a small spectral edit
    // is a small Hamming distance, and at Hamming ≤ 3 at least one of the
    // four 16-bit chunks agrees exactly (the mm_audio_hamming pledge).
    val rnd = new scala.util.Random(23 + SparkTestBase.stressSeed)
    val base = Array.fill(64)(if (rnd.nextBoolean()) 8L else -8L)
    def fpOf(c: Array[Long]): Long = signFp(Walsh.fwht(Walsh.fwht(c.clone())))
    // fwht(fwht(C)) = 64*C: signs of 64*C are signs of C — so fpOf really
    // round-trips the sample domain (samples = fwht(C), coefs = 64*C).
    val f0 = fpOf(base)
    for (k <- 1 to 3) {
      val edited = base.clone()
      var flipped = 0
      var i = 0
      while (flipped < k && i < 64) {
        if (rnd.nextBoolean() || 64 - i <= k - flipped) {
          edited(i) = -edited(i); flipped += 1
        }
        i += 1
      }
      val fk = fpOf(edited)
      assert(java.lang.Long.bitCount(f0 ^ fk) == k, s"$k planted flips")
      assert((0 until 4).exists(c =>
        ((f0 >> (16 * c)) & 0xffffL) == ((fk >> (16 * c)) & 0xffffL)))
    }
    // A genuinely different pattern is FAR: invert every sign.
    val inv = fpOf(base.map(-_))
    assert(java.lang.Long.bitCount(f0 ^ inv) == 64)
  }

  test("audioSpectrum is deterministic across partitionings and batch sizes") {
    val a = Multimodal.audioSpectrum(spark, docs, batchSize = 64)
      .collect().sortBy(_.doc_id)
    val b = Multimodal.audioSpectrum(spark, docs.repartition(5), batchSize = 7)
      .collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
    a.foreach { f =>
      assert(f.n_used >= 1 && f.n_used <= 64)
      assert(f.dominant_k >= 1 && f.dominant_k <= 63)
      assert(f.energy >= 0)
    }
  }
}
