package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed in partition-local batches.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic fake ([[FakeCodec]]) — but everything
  * Spark-side is real and load-bearing: the binary column, the metadata
  * struct schema, the batched `mapPartitions` shape (fixed-size batches ≅
  * Arrow record batches, so a real codec drops in without changing the
  * plan), and the partitioning story (payload bytes never shuffle — feature
  * extraction runs before any wide operator, and only the small typed
  * features flow on).
  */
object Multimodal {

  /** Decoded-media features; a real decoder would fill these from pixels. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Long,
      height: Long, channels: Long, mean_byte: Double)

  /** STUB CODEC — deterministic fake standing in for image/audio decode
    * (no codec libraries in this container). Geometry derives from the
    * payload length, `mean_byte` from the real bytes, so results are
    * reproducible and partition-order-independent.
    */
  object FakeCodec {
    def decode(docId: Long, payload: Array[Byte]): MediaFeatures = {
      val n = payload.length.toLong
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
      MediaFeatures(docId, n,
        width = n % 640, height = n / 640 + 1, channels = 3,
        mean_byte = if (n == 0) 0.0 else sum.toDouble / n)
    }
  }

  /** Attach a binary payload + metadata struct to the documents table —
    * the ingestion shape for media: `(doc_id, payload binary, meta struct)`.
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("image/fake").as("mime"),
        col("source").as("origin"),
        expr("octet_length(text)").cast("long").as("n_bytes")).as("meta"))

  /** Batched feature extraction over the payload column: partition-local,
    * `batchSize` records per codec call — the `mapInPandas`/Arrow batch
    * contract expressed in Scala. The payload never leaves the partition.
    */
  def extractFeatures(spark: SparkSession, docs: DataFrame,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    withPayload(docs)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) => FakeCodec.decode(id, bytes) }
        }
      }
  }

  /** Per-image pixel features from a REAL decode ([[Bmp]], not the fake):
    * doc_id + geometry + exact channel sums + the top-row checksum.
    */
  case class PixelFeatures(doc_id: Long, width: Long, height: Long,
      n_px: Long, sum_b: Long, sum_g: Long, sum_r: Long, top_row_sum: Long)

  /** Deterministic image payload for a document: a `w×h` 24-bit BMP whose
    * BGR pixel stream is the document's UTF-8 bytes repeated cyclically
    * (geometry from the byte length, so every doc gets a different shape,
    * padding and both stride cases included across the corpus). The
    * container ships no media files — this synthesizes real BMP bytes so
    * the decoder has something real to chew on; the decoder sees ONLY the
    * encoded bytes, never these parameters.
    */
  def syntheticBmp(textBytes: Array[Byte]): Array[Byte] = {
    val len = textBytes.length
    require(len > 0, "empty payload")
    val w = 1 + (len % 31)
    val h = 1 + ((len / 31) % 17)
    val px = new Array[Byte](3 * w * h)
    var i = 0
    while (i < px.length) { px(i) = textBytes(i % len); i += 1 }
    Bmp.encode(w, h, px)
  }

  /** The real-decode pipeline: synthesize the BMP payload, then round-trip
    * it through the actual byte-level decoder — header parse, stride
    * padding, bottom-up rows, BGR order — in partition-local batches.
    * Payload bytes never shuffle; only the fixed-width features flow on.
    */
  /** The text-stand-in payload contract: non-empty AND pure ASCII (byte
    * length == char length), so the DuckDB oracle's character indexing is
    * byte indexing. The shipped corpus is entirely ASCII; a non-ASCII doc
    * is excluded rather than silently hashed differently by the two
    * engines (real deployments carry an actual binary column instead).
    */
  private def asciiPayloadDocs(docs: DataFrame): DataFrame =
    docs.filter(length(col("text")) > 0 &&
      octet_length(col("text")) === length(col("text")))

  def pixelStats(spark: SparkSession, docs: DataFrame,
      batchSize: Int = 64): Dataset[PixelFeatures] = {
    import spark.implicits._
    asciiPayloadDocs(docs)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, text) =>
            val s = Bmp.decode(syntheticBmp(
              text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
            PixelFeatures(id, s.width, s.height, s.nPx, s.sumB, s.sumG,
              s.sumR, s.topRowSum)
          }
        }
      }
  }

  /** Per-image 16-bit perceptual hash over the real-decode path — the
    * image near-dup candidate key ([[Bmp.phash16]]). Same batched,
    * payload-local shape as [[pixelStats]].
    */
  /** Decoded-audio features from the REAL WAV decode ([[Wav]]): exact
    * amplitude sums so the query layer owns the one rounding step.
    */
  case class AudioFeatures(doc_id: Long, n_samples: Long, sample_rate: Long,
      sum_amp: Long, sum_sq: Long, peak: Long)

  /** Deterministic audio payload for a document: 8 kHz mono PCM16 WAV
    * whose sample stream maps each UTF-8 byte across the full int16 range
    * (`b*257 - 32768`), WITH an odd-sized LIST chunk between `fmt ` and
    * `data` — every synthesized file exercises the decoder's chunk walk
    * and pad-byte handling, not just the canonical 44-byte layout.
    */
  def syntheticWav(textBytes: Array[Byte]): Array[Byte] = {
    require(textBytes.length > 0, "empty payload")
    val samples = new Array[Short](textBytes.length)
    var i = 0
    while (i < samples.length) {
      samples(i) = ((textBytes(i) & 0xff) * 257 - 32768).toShort
      i += 1
    }
    Wav.encode(8000, samples, junkChunk = true)
  }

  /** The audio twin of [[pixelStats]]: synthesize the WAV payload, round-
    * trip it through the actual chunk-walking PCM decoder in partition-
    * local batches. Payload bytes never shuffle.
    */
  def audioStats(spark: SparkSession, docs: DataFrame,
      batchSize: Int = 64): Dataset[AudioFeatures] = {
    import spark.implicits._
    asciiPayloadDocs(docs)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, text) =>
            val s = Wav.decode(syntheticWav(
              text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
            AudioFeatures(id, s.nSamples, s.sampleRate, s.sumAmp, s.sumSq,
              s.peak)
          }
        }
      }
  }

  /** Deterministic COMPANDED audio payload for a document: an 8 kHz mono
    * G.711 mu-law WAV (format tag 7) whose code stream alternates wire
    * polarity — even positions carry the UTF-8 byte as-is (ASCII range →
    * sign-bit-clear wire codes → NEGATIVE expanded samples), odd positions
    * carry `b + 128` (sign-bit-set → positive) — so every payload expands
    * through both sign branches and exponent segments 0–5 of the
    * logarithmic table. The junk LIST chunk rides along as in
    * [[syntheticWav]], exercising the chunk walk on every file.
    */
  def syntheticMulawWav(textBytes: Array[Byte]): Array[Byte] = {
    require(textBytes.length > 0, "empty payload")
    val codes = new Array[Byte](textBytes.length)
    var i = 0
    while (i < codes.length) {
      val b = textBytes(i) & 0xff
      codes(i) = (if (i % 2 == 1) (b + 128) & 0xff else b).toByte
      i += 1
    }
    Wav.encodeMulaw(8000, codes, junkChunk = true)
  }

  /** The companding twin of [[audioStats]]: synthesize the mu-law WAV,
    * round-trip it through the real chunk walk + G.711 expansion in
    * partition-local batches. Payload bytes never shuffle.
    */
  def mulawStats(spark: SparkSession, docs: DataFrame,
      batchSize: Int = 64): Dataset[AudioFeatures] = {
    import spark.implicits._
    asciiPayloadDocs(docs)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, text) =>
            val s = Wav.decodeMulaw(syntheticMulawWav(
              text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
            AudioFeatures(id, s.nSamples, s.sampleRate, s.sumAmp, s.sumSq,
              s.peak)
          }
        }
      }
  }

  /** Deterministic PREDICTIVE-CODED audio payload for a document: an IMA
    * ADPCM WAV whose 4-bit code stream is `(byte_i + i) mod 16` — every
    * nibble value (both signs, all magnitude bits) appears across a
    * payload, so the adaptive step walks up AND down. Block headers are
    * predictor 0 / index 0 (an encoder's prerogative; the decoder reads
    * whatever the header says), blockAlign 8 → 9 samples per block, and
    * the `fact` chunk carries the true count so the final block's
    * padding nibbles are never decoded.
    */
  def syntheticAdpcmWav(textBytes: Array[Byte]): Array[Byte] = {
    require(textBytes.length > 0, "empty payload")
    val nibbles = new Array[Byte](textBytes.length)
    var i = 0
    while (i < nibbles.length) {
      nibbles(i) = (((textBytes(i) & 0xff) + i) % 16).toByte
      i += 1
    }
    Adpcm.encodeNibbles(8000, nibbles)
  }

  /** The predictive twin of [[audioStats]]/[[mulawStats]]: synthesize the
    * ADPCM WAV, round-trip it through the real extended-fmt/fact/block
    * walk + adaptive prediction loop in partition-local batches. Payload
    * bytes never shuffle.
    */
  def adpcmStats(spark: SparkSession, docs: DataFrame,
      batchSize: Int = 64): Dataset[AudioFeatures] = {
    import spark.implicits._
    asciiPayloadDocs(docs)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, text) =>
            val s = Adpcm.decode(syntheticAdpcmWav(
              text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
            AudioFeatures(id, s.nSamples, s.sampleRate, s.sumAmp, s.sumSq,
              s.peak)
          }
        }
      }
  }

  /** Walsh-spectrum features over the decoded analysis window: exact
    * integer coefficients (see [[Walsh]]), so dominance and energy are
    * engine-reproducible with no rounding step at all.
    */
  case class SpectrumFeatures(doc_id: Long, n_used: Long, dc: Long,
      dominant_k: Long, dominant_coef: Long, energy: Long)

  /** Spectral analysis over the real WAV decode: the first 64 PCM samples
    * (zero-padded when shorter) go through the O(n log n) FWHT butterfly,
    * and the features are the DC term, the dominant non-DC sequency (max
    * |coef|, smallest-k tie-break) and total spectral energy (Σ coef² —
    * Parseval-checked in tests). Same batched, payload-local shape as
    * [[audioStats]]: only the fixed-width feature row leaves the scan.
    */
  def audioSpectrum(spark: SparkSession, docs: DataFrame,
      batchSize: Int = 64): Dataset[SpectrumFeatures] = {
    import spark.implicits._
    asciiPayloadDocs(docs)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, text) =>
            val (_, samples) = Wav.decodeWindow(syntheticWav(
              text.getBytes(java.nio.charset.StandardCharsets.UTF_8)), 64)
            val a = new Array[Long](64)
            var i = 0
            while (i < samples.length) { a(i) = samples(i).toLong; i += 1 }
            Walsh.fwht(a)
            var bestK = 1
            var energy = 0L
            var k = 0
            while (k < 64) {
              energy += a(k) * a(k)
              if (k >= 1 && math.abs(a(k)) > math.abs(a(bestK))) bestK = k
              k += 1
            }
            SpectrumFeatures(id, samples.length.toLong, a(0), bestK.toLong,
              a(bestK), energy)
          }
        }
      }
  }

  /** 64-bit Walsh spectral fingerprints over the decoded audio window —
    * the audio analog of [[phashes64]]: bit k is the sign of Walsh
    * coefficient k (strictly positive → 1), so near-identical audio
    * differs in few bits and the Manku pigeonhole applies unchanged.
    * Same batched, payload-local shape: only (doc_id, fp) pairs leave
    * the scan stage.
    */
  def audioFingerprints(spark: SparkSession, docs: DataFrame,
      batchSize: Int = 64): Dataset[(Long, Long)] = {
    import spark.implicits._
    asciiPayloadDocs(docs)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, text) =>
            val (_, samples) = Wav.decodeWindow(syntheticWav(
              text.getBytes(java.nio.charset.StandardCharsets.UTF_8)), 64)
            val a = new Array[Long](64)
            var i = 0
            while (i < samples.length) { a(i) = samples(i).toLong; i += 1 }
            Walsh.fwht(a)
            var fp = 0L
            var k = 0
            while (k < 64) {
              if (a(k) > 0) fp |= 1L << k
              k += 1
            }
            id -> fp
          }
        }
      }
  }

  def phashes(spark: SparkSession, docs: DataFrame,
      batchSize: Int = 64): Dataset[(Long, Long)] = {
    import spark.implicits._
    asciiPayloadDocs(docs)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, text) =>
            id -> Bmp.phash16(syntheticBmp(
              text.getBytes(java.nio.charset.StandardCharsets.UTF_8))).toLong
          }
        }
      }
  }

  /** Deterministic COMPRESSED image payload for a document: an 8-bit RGB
    * PNG whose pixel stream is the document's UTF-8 bytes repeated
    * cyclically. Geometry differs from the BMP path (mod 29/13, height
    * floor 5) so every payload has ≥5 rows — and since [[Png.encode]]
    * filters row `y` with type `y % 5`, EVERY synthesized file exercises
    * all five PNG filter reconstructions plus IDAT reassembly (the
    * encoder always splits the compressed stream across two chunks).
    */
  def syntheticPng(textBytes: Array[Byte]): Array[Byte] = {
    val len = textBytes.length
    require(len > 0, "empty payload")
    val w = 1 + (len % 29)
    val h = 5 + ((len / 29) % 13)
    val px = new Array[Byte](3 * w * h)
    var i = 0
    while (i < px.length) { px(i) = textBytes(i % len); i += 1 }
    Png.encode(w, h, px)
  }

  /** The compressed-image twin of [[pixelStats]]: synthesize the PNG
    * payload, round-trip it through the real inflate + per-row filter
    * reconstruction in partition-local batches. Payload bytes never
    * shuffle; PNG channel order is RGB (sum_r first), rows top-down.
    */
  def pngStats(spark: SparkSession, docs: DataFrame,
      batchSize: Int = 64): Dataset[PixelFeatures] = {
    import spark.implicits._
    asciiPayloadDocs(docs)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, text) =>
            val s = Png.decode(syntheticPng(
              text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
            PixelFeatures(id, s.width, s.height, s.nPx, s.sumB, s.sumG,
              s.sumR, s.topRowSum)
          }
        }
      }
  }

  /** Decoded GIF index-stream features ([[Gif]]): exact index sums plus
    * the distinct-index count (palette utilization).
    */
  case class GifFeatures(doc_id: Long, width: Long, height: Long,
      n_px: Long, sum_idx: Long, n_colors: Long, top_row_sum: Long)

  /** Deterministic LZW-compressed image payload: a GIF87a whose 256-entry
    * grayscale palette maps index k → (k,k,k) and whose index stream is the
    * document's UTF-8 bytes repeated cyclically. Geometry (mod 23/19)
    * differs from the BMP/PNG paths; since the corpus text repeats
    * cyclically across rows, the LZW dictionary gets real hits on every
    * payload, exercising variable-width growth (and KwKwK on repeated-char
    * runs) — not just literal passthrough.
    */
  def syntheticGif(textBytes: Array[Byte]): Array[Byte] = {
    val len = textBytes.length
    require(len > 0, "empty payload")
    val w = 1 + (len % 23)
    val h = 1 + ((len / 23) % 19)
    val px = new Array[Byte](w * h)
    var i = 0
    while (i < px.length) { px(i) = textBytes(i % len); i += 1 }
    Gif.encode(w, h, px)
  }

  /** The LZW twin of [[pixelStats]]/[[pngStats]]: synthesize the GIF
    * payload, round-trip it through the real variable-width LZW decode in
    * partition-local batches. Payload bytes never shuffle.
    */
  def gifStats(spark: SparkSession, docs: DataFrame,
      batchSize: Int = 64): Dataset[GifFeatures] = {
    import spark.implicits._
    asciiPayloadDocs(docs)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, text) =>
            val s = Gif.decode(syntheticGif(
              text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
            GifFeatures(id, s.width, s.height, s.nPx, s.sumIdx, s.nColors,
              s.topRowSum)
          }
        }
      }
  }

  /** The production-width (64-bit, 8×8 grid) perceptual hashes — the key
    * stream for Hamming-tolerant visual near-dup ([[Bmp.phash64]]). Same
    * batched, payload-local shape: only (doc_id, hash) pairs leave the
    * scan stage.
    */
  def phashes64(spark: SparkSession, docs: DataFrame,
      batchSize: Int = 64): Dataset[(Long, Long)] = {
    import spark.implicits._
    asciiPayloadDocs(docs)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, text) =>
            id -> Bmp.phash64(syntheticBmp(
              text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
          }
        }
      }
  }

  /** Decoded-JPEG features from the real baseline decode ([[Jpeg]]):
    * exact integer sums (the query layer owns the one rounding step) plus
    * the block count the transform actually processed.
    */
  case class JpegFeatures(doc_id: Long, width: Long, height: Long,
      n_px: Long, sum_gray: Long, top_row_sum: Long, n_blocks: Long)

  /** Deterministic TRANSFORM-CODED image payload: a baseline grayscale
    * JPEG whose 8×8 blocks are each CONSTANT — block b (row-major in the
    * block grid) holds the document's byte `b mod len` — encoded with the
    * unit quantization table. Block-constant + unit quantizer makes the
    * lossy codec exact (every AC coefficient is exactly 0, the DC is
    * exactly 8·(v−128); see [[Jpeg]]'s exactness contract), so the DuckDB
    * closed form verifies the full entropy-decode + IDCT path
    * bit-for-bit. Docs with `len % 3 == 0` additionally get restart
    * markers every 2 MCUs, so a third of the corpus exercises RST
    * resynchronization and DC-predictor resets on every run.
    */
  def syntheticJpeg(textBytes: Array[Byte]): Array[Byte] = {
    val len = textBytes.length
    require(len > 0, "empty payload")
    val bw = 1 + (len % 7)
    val bh = 1 + ((len / 7) % 5)
    val w = 8 * bw
    val h = 8 * bh
    val gray = new Array[Byte](w * h)
    var b = 0
    while (b < bw * bh) {
      val v = textBytes(b % len)
      val y0 = 8 * (b / bw)
      val x0 = 8 * (b % bw)
      var y = 0
      while (y < 8) {
        java.util.Arrays.fill(gray, w * (y0 + y) + x0,
          w * (y0 + y) + x0 + 8, v)
        y += 1
      }
      b += 1
    }
    Jpeg.encode(w, h, gray, Jpeg.QuantUnit,
      restartInterval = if (len % 3 == 0) 2 else 0)
  }

  /** The transform-codec twin of [[pixelStats]]: synthesize the JPEG
    * payload, round-trip it through the real marker walk + Huffman
    * entropy decode + dequantize + IDCT in partition-local batches.
    * Payload bytes never shuffle; only fixed-width feature rows leave
    * the scan stage.
    */
  def jpegStats(spark: SparkSession, docs: DataFrame,
      batchSize: Int = 64): Dataset[JpegFeatures] = {
    import spark.implicits._
    asciiPayloadDocs(docs)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, text) =>
            val s = Jpeg.decode(syntheticJpeg(
              text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
            JpegFeatures(id, s.width, s.height, s.nPx, s.sumGray,
              s.topRowSum, s.nBlocks)
          }
        }
      }
  }

  /** Decoded color-JPEG features: exact per-plane sums (Y/Cb/Cr — color
    * conversion is downstream's choice, [[Jpeg.yccToRgb]]).
    */
  case class JpegColorFeatures(doc_id: Long, width: Long, height: Long,
      n_px: Long, sum_y: Long, sum_cb: Long, sum_cr: Long,
      top_row_y_sum: Long)

  /** Deterministic COLOR transform-coded payload: a 3-component 4:4:4
    * baseline JPEG whose per-component 8×8 blocks are each constant —
    * component `c` of block `b` holds the document's byte `(3b+c) mod
    * len`, so the three planes differ and a component interleave slip or
    * swapped DC predictor corrupts the per-plane sums. Unit quantizer →
    * exact (the [[Jpeg]] contract); docs with `len % 5 == 0` also carry
    * restart markers every 3 MCUs, exercising the COLOR restart path
    * (all three predictors reset together).
    */
  def syntheticJpegColor(textBytes: Array[Byte]): Array[Byte] = {
    val len = textBytes.length
    require(len > 0, "empty payload")
    val bw = 1 + (len % 6)
    val bh = 1 + ((len / 6) % 4)
    val w = 8 * bw
    val h = 8 * bh
    val ycc = new Array[Byte](3 * w * h)
    var b = 0
    while (b < bw * bh) {
      val y0 = 8 * (b / bw)
      val x0 = 8 * (b % bw)
      var c = 0
      while (c < 3) {
        val v = textBytes((3 * b + c) % len)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            ycc(3 * (w * (y0 + y) + x0 + x) + c) = v
            x += 1
          }
          y += 1
        }
        c += 1
      }
      b += 1
    }
    Jpeg.encodeColor(w, h, ycc, Jpeg.QuantUnit,
      restartInterval = if (len % 5 == 0) 3 else 0)
  }

  /** The color twin of [[jpegStats]]: synthesize the 4:4:4 payload,
    * round-trip it through the interleaved-MCU decode in partition-local
    * batches. Payload bytes never shuffle.
    */
  def jpegColorStats(spark: SparkSession, docs: DataFrame,
      batchSize: Int = 64): Dataset[JpegColorFeatures] = {
    import spark.implicits._
    asciiPayloadDocs(docs)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, text) =>
            val g = Jpeg.decodeYcc(syntheticJpegColor(
              text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
            var sy = 0L; var scb = 0L; var scr = 0L; var top = 0L
            var i = 0
            while (i < g.y.length) {
              sy += g.y(i); scb += g.cb(i); scr += g.cr(i)
              if (i < g.width) top += g.y(i)
              i += 1
            }
            JpegColorFeatures(id, g.width.toLong, g.height.toLong,
              g.width.toLong * g.height, sy, scb, scr, top)
          }
        }
      }
  }

  /** Per-frame features from a REAL video-container decode ([[Avi]]):
    * one row per SAMPLED frame, carrying the container-level truth
    * (geometry, declared total frame count) plus the frame's exact
    * channel sums.
    */
  case class VideoFrameFeatures(doc_id: Long, frame_idx: Long, width: Long,
      height: Long, n_frames: Long, n_px: Long, sum_b: Long, sum_g: Long,
      sum_r: Long)

  /** Deterministic video payload for a document: a `w×h`, 1–4-frame RIFF
    * AVI of uncompressed 24-bit DIB frames whose byte streams are the
    * document's UTF-8 bytes cyclically shifted by the frame index (frame
    * `f` byte `j` = text byte `(j+f) mod len`), so consecutive frames are
    * near- but not exactly identical, like real video. Geometry (mod
    * 19/13) differs from every image path; odd-length docs also get a
    * JUNK alignment chunk so half the corpus exercises the decoder's
    * unknown-chunk skip + pad-byte walk. The decoder sees ONLY the
    * encoded container bytes, never these parameters.
    */
  def syntheticAvi(textBytes: Array[Byte]): Array[Byte] = {
    val len = textBytes.length
    require(len > 0, "empty payload")
    val w = 1 + (len % 19)
    val h = 1 + ((len / 19) % 13)
    val nf = 1 + (len % 4)
    val frames = (0 until nf).map { f =>
      val px = new Array[Byte](3 * w * h)
      var j = 0
      while (j < px.length) { px(j) = textBytes((j + f) % len); j += 1 }
      px
    }
    Avi.encode(w, h, frames, junkChunk = len % 2 == 1)
  }

  /** The video twin of [[pixelStats]], with the ingest economics made
    * real: synthesize the AVI container, walk it with [[Avi.decodeSampled]]
    * at step 2 — every chunk header is parsed and validated (the container
    * is sequential), but pixel loops run only for even frame indices.
    * Same batched, payload-local shape: the container bytes never shuffle;
    * only fixed-width per-sampled-frame feature rows leave the scan.
    */
  def videoStats(spark: SparkSession, docs: DataFrame,
      batchSize: Int = 64): Dataset[VideoFrameFeatures] = {
    import spark.implicits._
    asciiPayloadDocs(docs)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.flatMap { case (id, text) =>
            val s = Avi.decodeSampled(syntheticAvi(
              text.getBytes(java.nio.charset.StandardCharsets.UTF_8)), 2)
            s.frames.map { f =>
              VideoFrameFeatures(id, f.frameIdx.toLong, s.width.toLong,
                s.height.toLong, s.nFrames.toLong,
                s.width.toLong * s.height, f.sumB, f.sumG, f.sumR)
            }
          }
        }
      }
  }

  /** Per-sampled-frame perceptual hashes from the real video decode — the
    * video near-dup key stream: (doc_id, frame_idx, fhash) where fhash is
    * the frame's 16-bit blockhash ([[Avi.FrameStats.phash16]], computed
    * on the same pixel pass as the channel sums). This path uses the
    * INDEX-SEEK decode ([[Avi.decodeIndexed]] — O(sampled) via idx1,
    * entries validated against the bytes they point at) while
    * [[videoStats]] keeps the full sequential walk: the two queries
    * deliberately exercise both ingest postures, and AviSpec pins their
    * frame-for-frame parity. Same batched, payload-local shape: the
    * container bytes never shuffle, only the fixed-width key rows leave
    * the scan stage.
    */
  def videoFramePhashes(spark: SparkSession, docs: DataFrame,
      batchSize: Int = 64): Dataset[(Long, Long, Long)] = {
    import spark.implicits._
    asciiPayloadDocs(docs)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.flatMap { case (id, text) =>
            val s = Avi.decodeIndexed(syntheticAvi(
              text.getBytes(java.nio.charset.StandardCharsets.UTF_8)), 2)
            s.frames.map(f => (id, f.frameIdx.toLong, f.phash16))
          }
        }
      }
  }
}
