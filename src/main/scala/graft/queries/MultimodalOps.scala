package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal plumbing as a declared operator: binary payload ingestion +
  * batched stub decode (see graft.multimodal.Multimodal — the codec is a
  * deterministic fake, the Spark plumbing is real). The oracle recomputes
  * the fake's closed form from the payload bytes.
  */
object MultimodalOps {
  import Tables.t

  val decodeStub = Q(
    "mm_decode_stub",
    "External-codec INTEGRATION SHAPE — the mm_* family's real decoders " +
      "(BMP/PNG/GIF/JPEG/WAV/μ-law/ADPCM/AVI, all pure-Scala) cover " +
      "every container format this corpus can carry; this query stands " +
      "in for the format class that CANNOT reasonably be pure-Scala'd: " +
      "DSP-heavy/patent-encumbered codecs (H.264/VP9 video, MP3/AAC/" +
      "Opus audio, WebP/HEIC images) whose production decode is a " +
      "native library behind JNI or a mapInPandas worker. What is real " +
      "and certified here is exactly what such a decoder would inherit: " +
      "the batched mapPartitions call shape (64-record batches ≅ the " +
      "Arrow batch contract), the typed feature schema out, and the " +
      "payload-locality law — payload bytes never shuffle, only the " +
      "small feature rows leave the scan stage. Swapping the byte-" +
      "counting stub body for an FFmpeg/libwebp call changes no plan " +
      "shape, no schema, and no partitioning.",
    Some("""
      SELECT doc_id,
             octet_length(encode(text))::BIGINT AS n_bytes,
             (octet_length(encode(text)) % 640)::BIGINT AS width,
             (octet_length(encode(text)) // 640 + 1)::BIGINT AS height,
             3::BIGINT AS channels
      FROM documents""".stripMargin),
    (spark, dir) =>
      Multimodal.extractFeatures(spark, t(spark, dir, "documents"))
        .toDF()
        .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
          col("channels")))

  val frameSample = Q(
    "mm_frame_sample",
    "Frame sampling over the payload stream — the video-ingestion " +
      "primitive (sample every k-th frame, fingerprint it): 256-byte " +
      "frames at stride 1024, up to 4 per payload, each md5-fingerprinted. " +
      "Pure scan-side column math (sequence + substring + md5): no " +
      "shuffle, no codec dependency — a real decoder would replace the " +
      "byte slice with a pixel decode at the same plan position. Payload " +
      "bytes never leave the scan stage; only (doc, frame_idx, " +
      "fingerprint) rows flow on.",
    Some("""
      SELECT doc_id, i::BIGINT AS frame_idx,
             md5(substr(text, (1 + i*1024)::INT, 256)) AS frame_fp,
             length(substr(text, (1 + i*1024)::INT, 256))::BIGINT AS frame_chars
      FROM (SELECT doc_id, text,
                   unnest(range(0, least(3, (length(text)-1)//1024) + 1)) AS i
            FROM documents WHERE length(text) > 0)""".stripMargin),
    (spark, dir) =>
      t(spark, dir, "documents")
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), col("text"),
          explode(expr("sequence(0L, least(3L, (length(text)-1) div 1024))"))
            .as("frame_idx"))
        .select(col("doc_id"), col("frame_idx"),
          expr("substring(text, cast(1 + frame_idx*1024 as int), 256)")
            .as("frame"))
        .select(col("doc_id"), col("frame_idx"),
          md5(col("frame")).as("frame_fp"),
          length(col("frame")).cast("long").as("frame_chars")))

  val byteEntropy = Q(
    "mm_byte_entropy",
    "Byte-distribution features over the payload — the corruption/" +
      "compressibility detector a media pipeline runs before decode " +
      "(uniform bytes ≈ encrypted/compressed, low entropy ≈ padding/" +
      "truncation): per-payload byte histogram → distinct-byte count and " +
      "Shannon entropy. One explode + two aggregations, payload-local " +
      "until only (doc, features) rows remain. The corpus payload is " +
      "ASCII, so char-level histograms are byte histograms and the DuckDB " +
      "oracle matches exactly (entropy epsilon-rounded: summation order " +
      "differs across engines).",
    Some("""
      WITH ch AS (SELECT doc_id, unnest(string_split_regex(text, '')) AS c
                  FROM documents),
           h AS (SELECT doc_id, c, count(*) AS n
                 FROM ch WHERE c <> '' GROUP BY doc_id, c),
           tot AS (SELECT doc_id, sum(n)::BIGINT AS total,
                          count(*) AS n_distinct
                   FROM h GROUP BY doc_id)
      SELECT h.doc_id, n_distinct,
             round(-sum((1.0*n/total) * ln(1.0*n/total)) + 1e-8, 4) AS entropy
      FROM h JOIN tot ON tot.doc_id = h.doc_id
      GROUP BY h.doc_id, n_distinct""".stripMargin),
    (spark, dir) => {
      val h = Q.materialize(
        t(spark, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), "")).as("c"))
          .filter(col("c") =!= "")
          .groupBy(col("doc_id"), col("c")).agg(count(lit(1)).as("n")))
      val tot = h.groupBy(col("doc_id"))
        .agg(sum(col("n")).cast("long").as("total"),
          count(lit(1)).as("n_distinct"))
      val p = col("n").cast("double") / col("total")
      h.join(tot, "doc_id")
        .groupBy(col("doc_id"), col("n_distinct"))
        .agg(Det.r4e(-sum(p * log(p))).as("entropy"))
        .select(col("doc_id"), col("n_distinct"), col("entropy"))
    })

  val pixelStats = Q(
    "mm_pixel_stats",
    "REAL image decode (not the stub): each document's bytes become an " +
      "actual 24-bit BMP payload (geometry from the byte length, BGR " +
      "pixel stream = the bytes repeated), and graft.multimodal.Bmp " +
      "decodes it back — little-endian header parse, 4-byte row-stride " +
      "padding, bottom-up row order, BGR channel order — in batched " +
      "mapPartitions. Output: geometry + per-channel means + the top-row " +
      "checksum. Every decoder detail is oracle-verified: swapped " +
      "channels flip mean_b/mean_r, counted padding pollutes the means, " +
      "unreversed rows flip top_row_sum. The oracle computes the same " +
      "stats from the same bytes via the synthesis closed form (DuckDB " +
      "cannot parse BMP; the SPARK side genuinely round-trips the " +
      "encoded bytes). Both sides restrict to ASCII documents " +
      "(octet_length = char length — the whole shipped corpus) so the " +
      "oracle's character indexing IS byte indexing; a non-ASCII doc " +
      "would need a real binary payload column, not this text stand-in. " +
      "Payload never shuffles — the plan is one scan, zero exchanges.",
    Some("""
      WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS len
                 FROM documents
                 WHERE length(text) > 0
                   AND octet_length(encode(text)) = length(text)),
           g AS (SELECT doc_id, text, len,
                        1 + (len % 31) AS w, 1 + ((len // 31) % 17) AS h
                 FROM d),
           v AS (SELECT doc_id, w, h, i % 3 AS c, i < 3*w AS top,
                        ascii(substr(text, (i % len)::INT + 1, 1)) AS val
                 FROM (SELECT doc_id, text, len, w, h,
                              unnest(range(0, 3*w*h)) AS i
                       FROM g))
      SELECT doc_id, w::BIGINT AS width, h::BIGINT AS height,
             (w*h)::BIGINT AS n_px,
             round(sum(CASE WHEN c=0 THEN val END)::DOUBLE / (w*h) + 1e-8, 4) AS mean_b,
             round(sum(CASE WHEN c=1 THEN val END)::DOUBLE / (w*h) + 1e-8, 4) AS mean_g,
             round(sum(CASE WHEN c=2 THEN val END)::DOUBLE / (w*h) + 1e-8, 4) AS mean_r,
             sum(CASE WHEN top THEN val ELSE 0 END)::BIGINT AS top_row_sum
      FROM v GROUP BY doc_id, w, h""".stripMargin),
    (spark, dir) =>
      Multimodal.pixelStats(spark, t(spark, dir, "documents"))
        .toDF()
        .select(col("doc_id"), col("width"), col("height"), col("n_px"),
          Det.r4e(col("sum_b").cast("double") / col("n_px")).as("mean_b"),
          Det.r4e(col("sum_g").cast("double") / col("n_px")).as("mean_g"),
          Det.r4e(col("sum_r").cast("double") / col("n_px")).as("mean_r"),
          col("top_row_sum")))

  val phash = Q(
    "mm_phash",
    "Image near-dup candidates by perceptual hash — the visual analog of " +
      "SimHash banding (blockhash family): each decoded BMP is cut into " +
      "a 4x4 grid in image space, a bit per cell marks brighter-than-" +
      "global-mean (exact integer cross-multiplication, no floats — " +
      "engine-identical bits), and images sharing the 16-bit hash are " +
      "candidate visual dups. Output: (doc_id, phash, n_same) where " +
      "n_same counts hash collisions — the census an image-dedup stage " +
      "feeds its verify join. The decode runs ONCE into a materialized " +
      "(doc_id, phash) frame; the census is an aggregation on the " +
      "16-bit key (bounded at 2^bits groups — production uses 64-256 " +
      "bit grids, same plan) broadcast-joined back. At 100 TB nothing " +
      "but (id, hash) pairs shuffle; payloads stay in their scan " +
      "partitions.",
    Some("""
      WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS len
                 FROM documents
                 WHERE length(text) > 0
                   AND octet_length(encode(text)) = length(text)),
           g AS (SELECT doc_id, text, len,
                        1 + (len % 31) AS w, 1 + ((len // 31) % 17) AS h
                 FROM d),
           lum AS (SELECT doc_id,
                          ascii(substr(text, (3*k % len)::INT + 1, 1))
                        + ascii(substr(text, ((3*k+1) % len)::INT + 1, 1))
                        + ascii(substr(text, ((3*k+2) % len)::INT + 1, 1)) AS l,
                          ((k % w) * 4 // w) + 4 * ((k // w) * 4 // h) AS blk
                   FROM (SELECT doc_id, text, len, w, h,
                                unnest(range(0, w*h)) AS k
                         FROM g)),
           blocks AS (SELECT doc_id, blk, sum(l)::BIGINT AS bs,
                             count(*)::BIGINT AS bn
                      FROM lum GROUP BY doc_id, blk),
           tot AS (SELECT doc_id, sum(bs)::BIGINT AS ts, sum(bn)::BIGINT AS tn
                   FROM blocks GROUP BY doc_id),
           ph AS (SELECT b.doc_id,
                         sum(CASE WHEN bs * tn > ts * bn
                             THEN 1::BIGINT << blk ELSE 0 END)::BIGINT AS phash
                  FROM blocks b JOIN tot t ON t.doc_id = b.doc_id
                  GROUP BY b.doc_id)
      SELECT p.doc_id, p.phash, c.n_same
      FROM ph p JOIN (SELECT phash, count(*)::BIGINT AS n_same
                      FROM ph GROUP BY phash) c ON c.phash = p.phash""".stripMargin),
    (spark, dir) => {
      val ph = Q.materialize(
        Multimodal.phashes(spark, t(spark, dir, "documents"))
          .toDF("doc_id", "phash"))
      val census = ph.groupBy(col("phash"))
        .agg(count(lit(1)).as("n_same"))
      // The census is bounded at 2^bits rows regardless of corpus size —
      // broadcast explicitly so the documented plan shape doesn't depend
      // on AQE statistics picking it.
      ph.join(broadcast(census), "phash")
        .select(col("doc_id"), col("phash"), col("n_same"))
    })

  val pngStats = Q(
    "mm_png_stats",
    "REAL COMPRESSED image decode — the first entropy-coded codec (8-bit " +
      "RGB PNG via the JDK's zlib): each document's bytes become an " +
      "actual PNG whose rows are delta-coded with ALL FIVE filter types " +
      "(row y uses filter y mod 5; the synthetic geometry guarantees >=5 " +
      "rows) and whose compressed stream is split across two IDAT " +
      "chunks, so every payload exercises chunk-walking with per-chunk " +
      "CRC32 validation, IDAT reassembly, zlib inflate with an exact " +
      "size contract, and per-row None/Sub/Up/Average/Paeth " +
      "reconstruction. graft.multimodal.Png does the byte work; the " +
      "query derives geometry + per-channel means + the top-row " +
      "checksum, all oracle-verified from the synthesis closed form " +
      "(channel order RGB — a BGR confusion flips mean_r/mean_b; a " +
      "mis-implemented filter corrupts every row below it and breaks " +
      "the sums). ASCII contract as mm_pixel_stats. One scan, zero " +
      "exchanges; payload bytes never shuffle.",
    Some("""
      WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS len
                 FROM documents
                 WHERE length(text) > 0
                   AND octet_length(encode(text)) = length(text)),
           g AS (SELECT doc_id, text, len,
                        1 + (len % 29) AS w, 5 + ((len // 29) % 13) AS h
                 FROM d),
           v AS (SELECT doc_id, w, h, i % 3 AS c, i < 3*w AS top,
                        ascii(substr(text, (i % len)::INT + 1, 1)) AS val
                 FROM (SELECT doc_id, text, len, w, h,
                              unnest(range(0, 3*w*h)) AS i
                       FROM g))
      SELECT doc_id, w::BIGINT AS width, h::BIGINT AS height,
             (w*h)::BIGINT AS n_px,
             round(sum(CASE WHEN c=0 THEN val END)::DOUBLE / (w*h) + 1e-8, 4) AS mean_r,
             round(sum(CASE WHEN c=1 THEN val END)::DOUBLE / (w*h) + 1e-8, 4) AS mean_g,
             round(sum(CASE WHEN c=2 THEN val END)::DOUBLE / (w*h) + 1e-8, 4) AS mean_b,
             sum(CASE WHEN top THEN val ELSE 0 END)::BIGINT AS top_row_sum
      FROM v GROUP BY doc_id, w, h""".stripMargin),
    (spark, dir) =>
      Multimodal.pngStats(spark, t(spark, dir, "documents"))
        .toDF()
        .select(col("doc_id"), col("width"), col("height"), col("n_px"),
          Det.r4e(col("sum_r").cast("double") / col("n_px")).as("mean_r"),
          Det.r4e(col("sum_g").cast("double") / col("n_px")).as("mean_g"),
          Det.r4e(col("sum_b").cast("double") / col("n_px")).as("mean_b"),
          col("top_row_sum")))

  /** DuckDB closed form of [[graft.multimodal.Bmp.phash64]] over the
    * synthetic payload: CTE chain ending in `ph(doc_id, phash)`. The 8×8
    * grid needs bit 63, which DuckDB cannot reach by `1 << 63` (overflow
    * error) — the Long.MinValue literal supplies it; two's-complement sum
    * then reproduces the JVM hash bit-for-bit.
    */
  private val Phash64Sql = """
      d AS (SELECT doc_id, text, octet_length(encode(text)) AS len
                 FROM documents
                 WHERE length(text) > 0
                   AND octet_length(encode(text)) = length(text)),
           g AS (SELECT doc_id, text, len,
                        1 + (len % 31) AS w, 1 + ((len // 31) % 17) AS h
                 FROM d),
           lum AS (SELECT doc_id,
                          ascii(substr(text, (3*k % len)::INT + 1, 1))
                        + ascii(substr(text, ((3*k+1) % len)::INT + 1, 1))
                        + ascii(substr(text, ((3*k+2) % len)::INT + 1, 1)) AS l,
                          ((k % w) * 8 // w) + 8 * ((k // w) * 8 // h) AS blk
                   FROM (SELECT doc_id, text, len, w, h,
                                unnest(range(0, w*h)) AS k
                         FROM g)),
           blocks AS (SELECT doc_id, blk, sum(l)::BIGINT AS bs,
                             count(*)::BIGINT AS bn
                      FROM lum GROUP BY doc_id, blk),
           tot AS (SELECT doc_id, sum(bs)::BIGINT AS ts, sum(bn)::BIGINT AS tn
                   FROM blocks GROUP BY doc_id),
           ph AS (SELECT b.doc_id,
                         sum(CASE WHEN bs * tn > ts * bn
                             THEN CASE WHEN blk = 63
                                  THEN (-9223372036854775807 - 1)
                                  ELSE 1::BIGINT << blk END
                             ELSE 0 END)::BIGINT AS phash
                  FROM blocks b JOIN tot t ON t.doc_id = b.doc_id
                  GROUP BY b.doc_id)"""

  val phashHamming = Q(
    "mm_phash_hamming",
    "Hamming-tolerant image near-dup pairs — the production form of " +
      "mm_phash: the 16-bit 4x4 hash collides whole style families, so " +
      "the production key is the 64-bit 8x8 blockhash (Bmp.phash64) and " +
      "near-dups are pairs within HAMMING distance 3 of each other, " +
      "found WITHOUT an all-pairs product by the same Manku 4-chunk " +
      "pigeonhole the text side uses (dedup_simhash_hamming): any pair " +
      "within Hamming 3 agrees exactly on one of the four 16-bit chunks, " +
      "so candidates come from capped bucket equi-joins on (chunk_index, " +
      "chunk_value) and only candidates pay the popcount(xor) check. " +
      "Decode runs ONCE into a materialized (doc_id, phash64) frame; at " +
      "100 TB only (id, hash) pairs shuffle, payloads never leave their " +
      "scan partitions, and the bucket cap keeps a degenerate hot chunk " +
      "from going quadratic (identical cap mirrored in the oracle). " +
      "MultimodalSpec's planted-recall leg proves the pigeonhole equals " +
      "the exhaustive N-squared result on near-identical images.",
    Some(s"""
      WITH $Phash64Sql,
           chunks AS (SELECT doc_id, phash, c.chunk,
                             (phash >> (16*c.chunk)) & 65535 AS key
                      FROM ph, (VALUES (0),(1),(2),(3)) c(chunk)),
           ok AS (SELECT chunk, key FROM chunks GROUP BY chunk, key
                  HAVING count(*) > 1 AND count(*) <= 1000),
           cand AS (
             SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                    a.phash AS pa, b.phash AS pb
             FROM chunks a
             JOIN chunks b ON a.chunk = b.chunk AND a.key = b.key
                          AND a.doc_id < b.doc_id
             JOIN ok ON ok.chunk = a.chunk AND ok.key = a.key)
      SELECT doc_a, doc_b, bit_count(xor(pa, pb))::BIGINT AS hamming
      FROM cand
      WHERE bit_count(xor(pa, pb)) <= 3""".stripMargin),
    (spark, dir) => {
      val ph = Q.materialize(
        Multimodal.phashes64(spark, t(spark, dir, "documents"))
          .toDF("doc_id", "phash"))
      val chunkStructs = (0 until 4).map(c =>
        struct(lit(c).as("band"),
          shiftright(col("phash"), 16 * c).bitwiseAND(lit(65535L)).as("key")))
      val keyed = ph.select(
        struct(col("doc_id"), col("phash")).as("m"),
        explode(array(chunkStructs: _*)).as("ck"))
        .select(col("ck.band").as("band"), col("ck.key").as("key"), col("m"))
      val hamming = bit_count(col("pa").bitwiseXOR(col("pb")))
      Lsh.bucketPairs(keyed)
        .select(col("p.a.doc_id").as("doc_a"), col("p.b.doc_id").as("doc_b"),
          col("p.a.phash").as("pa"), col("p.b.phash").as("pb"))
        .distinct()
        .filter(hamming <= 3)
        .select(col("doc_a"), col("doc_b"), hamming.cast("long").as("hamming"))
    })

  val jpegStats = Q(
    "mm_jpeg_stats",
    "REAL TRANSFORM-CODEC decode — baseline JPEG, the production image " +
      "format (graft.multimodal.Jpeg, zero dependencies): each " +
      "document's bytes become an actual JFIF stream — FDCT'd, " +
      "quantized, differential-DC + run/size-AC Huffman coded with the " +
      "standard Annex K tables, 0xFF00 byte-stuffed, a third of the " +
      "corpus carrying RST restart markers — and the decoder walks the " +
      "marker segments, rebuilds canonical Huffman tables from the DHT " +
      "wire form, entropy-decodes every block, dequantizes through the " +
      "zigzag order and runs the separable IDCT. The synthesis is " +
      "block-constant with a unit quantizer, which makes the lossy " +
      "codec mathematically exact (AC exactly 0, DC exactly 8*(v-128) " +
      "— Jpeg.scala's exactness contract), so the closed-form oracle " +
      "verifies the FULL transform path bit-for-bit: a mis-built " +
      "Huffman table, a broken EXTEND sign, a zigzag slip or an IDCT " +
      "scale error each corrupt exact integer sums. General lossy " +
      "streams and third-party (JDK ImageIO) streams are differential-" +
      "tested in JpegSpec. ASCII contract as mm_pixel_stats. One scan, " +
      "zero exchanges; payload bytes never shuffle.",
    Some("""
      WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS len
                 FROM documents
                 WHERE length(text) > 0
                   AND octet_length(encode(text)) = length(text)),
           g AS (SELECT doc_id, text, len,
                        1 + (len % 7) AS bw, 1 + ((len // 7) % 5) AS bh
                 FROM d),
           v AS (SELECT doc_id, bw, bh, b < bw AS top,
                        ascii(substr(text, (b % len)::INT + 1, 1)) AS val
                 FROM (SELECT doc_id, text, len, bw, bh,
                              unnest(range(0, bw*bh)) AS b
                       FROM g))
      SELECT doc_id, (8*bw)::BIGINT AS width, (8*bh)::BIGINT AS height,
             (64*bw*bh)::BIGINT AS n_px, (bw*bh)::BIGINT AS n_blocks,
             round(sum(val)::DOUBLE / (bw*bh) + 1e-8, 4) AS mean_gray,
             (8 * sum(CASE WHEN top THEN val ELSE 0 END))::BIGINT
               AS top_row_sum
      FROM v GROUP BY doc_id, bw, bh""".stripMargin),
    (spark, dir) =>
      Multimodal.jpegStats(spark, t(spark, dir, "documents"))
        .toDF()
        .select(col("doc_id"), col("width"), col("height"), col("n_px"),
          col("n_blocks"),
          Det.r4e(col("sum_gray").cast("double") / col("n_px")).as("mean_gray"),
          col("top_row_sum")))

  val jpegColor = Q(
    "mm_jpeg_color",
    "COLOR transform-codec decode — the 3-component face of " +
      "mm_jpeg_stats: a 4:4:4 baseline JPEG with interleaved MCUs (one " +
      "block per component per MCU, per-component Huffman/quant table " +
      "assignments and DC predictors — the wire form real 4:4:4 " +
      "encoders produce; a fifth of the corpus also carries restart " +
      "markers, resetting all three predictors together). The decoder " +
      "returns full-resolution Y/Cb/Cr planes; color conversion is " +
      "downstream's choice (Jpeg.yccToRgb = BT.601), which keeps the " +
      "codec exactly invertible for the block-constant unit-quantizer " +
      "synthesis — so the closed-form oracle verifies per-PLANE exact " +
      "sums: a component interleave slip, a swapped predictor, or a " +
      "chroma table mixup each corrupt mean_cb/mean_cr, not epsilons. " +
      "The decoder also handles the chroma-subsampled 4:2:0/4:2:2 " +
      "geometries real encoders default to (4-luma+Cb+Cr MCUs, native-" +
      "resolution chroma, box upsampling) — JpegSpec pins that against " +
      "a REAL ImageIO-written 4:2:0 color file. ASCII contract as " +
      "mm_pixel_stats. One scan, zero exchanges; payload never shuffles.",
    Some("""
      WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS len
                 FROM documents
                 WHERE length(text) > 0
                   AND octet_length(encode(text)) = length(text)),
           g AS (SELECT doc_id, text, len,
                        1 + (len % 6) AS bw, 1 + ((len // 6) % 4) AS bh
                 FROM d),
           v AS (SELECT doc_id, bw, bh, ch.c, b < bw AS top,
                        ascii(substr(text, ((3*b + ch.c) % len)::INT + 1, 1))
                          AS val
                 FROM (SELECT doc_id, text, len, bw, bh,
                              unnest(range(0, bw*bh)) AS b
                       FROM g), (VALUES (0),(1),(2)) ch(c))
      SELECT doc_id, (8*bw)::BIGINT AS width, (8*bh)::BIGINT AS height,
             (64*bw*bh)::BIGINT AS n_px,
             round(sum(CASE WHEN c=0 THEN val END)::DOUBLE / (bw*bh) + 1e-8, 4)
               AS mean_y,
             round(sum(CASE WHEN c=1 THEN val END)::DOUBLE / (bw*bh) + 1e-8, 4)
               AS mean_cb,
             round(sum(CASE WHEN c=2 THEN val END)::DOUBLE / (bw*bh) + 1e-8, 4)
               AS mean_cr,
             (8 * sum(CASE WHEN top AND c=0 THEN val ELSE 0 END))::BIGINT
               AS top_row_y_sum
      FROM v GROUP BY doc_id, bw, bh""".stripMargin),
    (spark, dir) =>
      Multimodal.jpegColorStats(spark, t(spark, dir, "documents"))
        .toDF()
        .select(col("doc_id"), col("width"), col("height"), col("n_px"),
          Det.r4e(col("sum_y").cast("double") / col("n_px")).as("mean_y"),
          Det.r4e(col("sum_cb").cast("double") / col("n_px")).as("mean_cb"),
          Det.r4e(col("sum_cr").cast("double") / col("n_px")).as("mean_cr"),
          col("top_row_y_sum")))

  val wavStats = Q(
    "mm_wav_stats",
    "REAL audio decode — the second dependency-free codec (RIFF/WAVE " +
      "PCM16): each document's bytes become an actual 8 kHz mono WAV " +
      "whose sample stream spans the full int16 range, with an odd-sized " +
      "LIST chunk inserted between fmt and data so EVERY payload " +
      "exercises the decoder's chunk walk and pad-byte handling (the " +
      "detail naive offset-44 readers get wrong on files in the wild). " +
      "graft.multimodal.Wav walks the chunk list, validates the PCM16 " +
      "mono format tag, sign-extends the little-endian samples, and " +
      "emits exact amplitude sums; the query derives duration, peak, " +
      "mean and RMS. Oracle: the synthesis closed form over the same " +
      "bytes (ASCII contract as mm_pixel_stats). One scan, zero " +
      "exchanges; payload never shuffles.",
    Some("""
      WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS len
                 FROM documents
                 WHERE length(text) > 0
                   AND octet_length(encode(text)) = length(text)),
           s AS (SELECT doc_id, len,
                        ascii(substr(text, (i + 1)::INT, 1)) * 257 - 32768 AS amp
                 FROM (SELECT doc_id, text, len, unnest(range(0, len)) AS i
                       FROM d))
      SELECT doc_id, len::BIGINT AS n_samples, 8000::BIGINT AS sample_rate,
             (len * 1000 // 8000)::BIGINT AS duration_ms,
             max(abs(amp))::BIGINT AS peak,
             round(sum(amp)::DOUBLE / len + 1e-8, 4) AS mean_amp,
             round(sqrt(sum(amp::BIGINT * amp)::DOUBLE / len) + 1e-8, 4) AS rms
      FROM s GROUP BY doc_id, len""".stripMargin),
    (spark, dir) =>
      Multimodal.audioStats(spark, t(spark, dir, "documents"))
        .toDF()
        .select(col("doc_id"), col("n_samples"), col("sample_rate"),
          expr("n_samples * 1000L div sample_rate").as("duration_ms"),
          col("peak"),
          Det.r4e(col("sum_amp").cast("double") / col("n_samples"))
            .as("mean_amp"),
          Det.r4e(sqrt(col("sum_sq").cast("double") / col("n_samples")))
            .as("rms")))

  val ulawStats = Q(
    "mm_ulaw_stats",
    "REAL COMPANDED audio decode — the logarithmic-quantization codec " +
      "class (ITU-T G.711 mu-law, the WAVE format-tag-7 profile 8 kHz " +
      "telephony audio actually ships in): each document's bytes become " +
      "a mu-law WAV whose wire codes alternate polarity by position, so " +
      "every payload expands through BOTH sign branches and exponent " +
      "segments 0-5 of the logarithmic table; the junk LIST chunk rides " +
      "along so every file exercises the chunk walk. graft.multimodal." +
      "Wav walks the chunks, validates the format-7/8-bit profile, and " +
      "expands each one's-complement code through the classic " +
      "BIAS-132/4-bit-mantissa formulation to exact linear PCM16 sums. " +
      "MulawSpec pins the expansion table sample-for-sample against the " +
      "JDK's OWN independent javax.sound G.711 decoder and round-trips " +
      "compression. Oracle: the expansion arithmetic in SQL over the " +
      "same bytes (ASCII contract as mm_pixel_stats). One scan, zero " +
      "exchanges; payload never shuffles.",
    Some("""
      WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS len
                 FROM documents
                 WHERE length(text) > 0
                   AND octet_length(encode(text)) = length(text)),
           u AS (SELECT doc_id, len,
                        255 - CASE WHEN i % 2 = 1
                                   THEN (ascii(substr(text, (i + 1)::INT, 1)) + 128) % 256
                                   ELSE ascii(substr(text, (i + 1)::INT, 1)) END AS uc
                 FROM (SELECT doc_id, text, len, unnest(range(0, len)) AS i
                       FROM d)),
           s AS (SELECT doc_id, len,
                        CASE WHEN uc >= 128 THEN 132 - t ELSE t - 132 END AS amp
                 FROM (SELECT doc_id, len, uc,
                              ((uc % 16) * 8 + 132) << ((uc // 16) % 8) AS t
                       FROM u))
      SELECT doc_id, len::BIGINT AS n_samples, 8000::BIGINT AS sample_rate,
             (len * 1000 // 8000)::BIGINT AS duration_ms,
             max(abs(amp))::BIGINT AS peak,
             round(sum(amp)::DOUBLE / len + 1e-8, 4) AS mean_amp,
             round(sqrt(sum(amp::BIGINT * amp)::DOUBLE / len) + 1e-8, 4) AS rms
      FROM s GROUP BY doc_id, len""".stripMargin),
    (spark, dir) =>
      Multimodal.mulawStats(spark, t(spark, dir, "documents"))
        .toDF()
        .select(col("doc_id"), col("n_samples"), col("sample_rate"),
          expr("n_samples * 1000L div sample_rate").as("duration_ms"),
          col("peak"),
          Det.r4e(col("sum_amp").cast("double") / col("n_samples"))
            .as("mean_amp"),
          Det.r4e(sqrt(col("sum_sq").cast("double") / col("n_samples")))
            .as("rms")))

  /** IMA step/index tables as DuckDB list literals for the ADPCM oracle's
    * stateful list_reduce recursion — same values as
    * [[graft.multimodal.Adpcm.StepTable]]/[[graft.multimodal.Adpcm.IndexTable]].
    */
  private val AdpcmStSql = graft.multimodal.Adpcm.StepTable
    .mkString("[", ",", "]::BIGINT[]")
  private val AdpcmItSql = graft.multimodal.Adpcm.IndexTable
    .mkString("[", ",", "]::BIGINT[]")

  /** The reconstructed-sample expression of the ADPCM oracle lambda:
    * clamp(pred ± (step/8 [+step][+step/2][+step/4])). Appears twice in
    * the reduce (new state head + appended sample) because SQL lambdas
    * cannot bind locals.
    */
  private val AdpcmPredSql = """greatest(-32768, least(32767,
      a[1] + (CASE WHEN x[1] >= 8 THEN -1 ELSE 1 END) *
        (st[(a[2]+1)::INT] // 8
         + CASE WHEN (x[1] // 4) % 2 = 1 THEN st[(a[2]+1)::INT] ELSE 0 END
         + CASE WHEN (x[1] // 2) % 2 = 1 THEN st[(a[2]+1)::INT] // 2 ELSE 0 END
         + CASE WHEN x[1] % 2 = 1 THEN st[(a[2]+1)::INT] // 4 ELSE 0 END)))"""

  val adpcmStats = Q(
    "mm_adpcm_stats",
    "REAL PREDICTIVE audio decode — IMA/DVI ADPCM (WAVE format tag " +
      "0x11), the adaptive differential codec class (each 4-bit code is " +
      "a quantized PREDICTION ERROR; the decoder carries per-block " +
      "(predictor, step-index) state through the standard 89-entry " +
      "adaptive step table, so one mis-decoded nibble corrupts every " +
      "later sample of its block — exactly what makes the stats oracle-" +
      "sensitive). The container is the canonical mono profile: " +
      "EXTENDED fmt chunk (cbSize + samplesPerBlock, cross-validated " +
      "against blockAlign), a fact chunk carrying the true sample count " +
      "(the real mechanism that keeps final-block padding nibbles " +
      "undecoded), 8-byte blocks of [predictor i16, index u8, reserved, " +
      "nibbles low-first]. Synthesis: nibble i = (byte_i + i) mod 16 — " +
      "all 16 code values appear, the step walks up AND down. Oracle: " +
      "the full stateful recursion in SQL via list_reduce with a " +
      "growing accumulator (state head + decoded-sample tail) — the " +
      "repo's first sequentially-recursive oracle. AdpcmSpec adds the " +
      "real encoder (encoder-embeds-decoder state tracking) with a " +
      "committed round-trip error bound. One scan, zero exchanges; " +
      "payload never shuffles.",
    Some(s"""
      WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS len
                 FROM documents
                 WHERE length(text) > 0
                   AND octet_length(encode(text)) = length(text)),
           tabs AS (SELECT $AdpcmStSql AS st, $AdpcmItSql AS it),
           nib AS (SELECT doc_id, len, i // 8 AS blk, i % 8 AS pos,
                          ((ascii(substr(text, (i+1)::INT, 1)) + i) % 16)::BIGINT AS n
                   FROM (SELECT doc_id, text, len, unnest(range(0, len)) AS i
                         FROM d)),
           blk AS (SELECT doc_id, len, blk,
                          list_prepend([0::BIGINT, 0], list([n] ORDER BY pos)) AS lst
                   FROM nib GROUP BY doc_id, len, blk),
           r AS (SELECT doc_id, len,
                        list_reduce(lst, (a, x) ->
                          list_append(
                            [$AdpcmPredSql,
                             greatest(0, least(88, a[2] + it[(x[1]+1)::INT]))] ||
                            a[3:],
                            $AdpcmPredSql)) AS res
                 FROM blk CROSS JOIN tabs),
           s AS (SELECT doc_id, len, unnest(res[3:]) AS amp FROM r)
      SELECT doc_id, (len + (len + 7) // 8)::BIGINT AS n_samples,
             8000::BIGINT AS sample_rate,
             ((len + (len + 7) // 8) * 1000 // 8000)::BIGINT AS duration_ms,
             max(abs(amp))::BIGINT AS peak,
             round(sum(amp)::DOUBLE / (len + (len + 7) // 8) + 1e-8, 4) AS mean_amp,
             round(sqrt(sum(amp*amp)::DOUBLE / (len + (len + 7) // 8)) + 1e-8, 4) AS rms
      FROM s GROUP BY doc_id, len""".stripMargin),
    (spark, dir) =>
      Multimodal.adpcmStats(spark, t(spark, dir, "documents"))
        .toDF()
        .select(col("doc_id"), col("n_samples"), col("sample_rate"),
          expr("n_samples * 1000L div sample_rate").as("duration_ms"),
          col("peak"),
          Det.r4e(col("sum_amp").cast("double") / col("n_samples"))
            .as("mean_amp"),
          Det.r4e(sqrt(col("sum_sq").cast("double") / col("n_samples")))
            .as("rms")))

  val gifStats = Q(
    "mm_gif_stats",
    "REAL DICTIONARY-CODED image decode — the second entropy coder " +
      "(GIF87a/LZW via graft.multimodal.Gif, zero dependencies): each " +
      "document's bytes become an actual GIF whose 256-entry grayscale " +
      "palette is validated entry-by-entry and whose index stream is " +
      "LZW-coded with variable-width codes (9 to 12 bits, LSB-first), " +
      "CLEAR/EOI control codes, 4096-entry dictionary resets and the " +
      "KwKwK corner case — a coder family DEFLATE never exercises. The " +
      "decoder walks screen/image descriptors, reassembles sub-blocks, " +
      "extracts bit-level codes and rebuilds the string table; the " +
      "query derives geometry, mean index, palette utilization " +
      "(distinct indices) and the top-row checksum, all oracle-verified " +
      "from the synthesis closed form (a mis-synced code width or a " +
      "botched KwKwK corrupts every pixel after it and breaks the " +
      "sums). ASCII contract as mm_pixel_stats. One scan, zero " +
      "exchanges; payload bytes never shuffle.",
    Some("""
      WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS len
                 FROM documents
                 WHERE length(text) > 0
                   AND octet_length(encode(text)) = length(text)),
           g AS (SELECT doc_id, text, len,
                        1 + (len % 23) AS w, 1 + ((len // 23) % 19) AS h
                 FROM d),
           v AS (SELECT doc_id, w, h, k < w AS top,
                        ascii(substr(text, (k % len)::INT + 1, 1)) AS val
                 FROM (SELECT doc_id, text, len, w, h,
                              unnest(range(0, w*h)) AS k
                       FROM g))
      SELECT doc_id, w::BIGINT AS width, h::BIGINT AS height,
             (w*h)::BIGINT AS n_px,
             round(sum(val)::DOUBLE / (w*h) + 1e-8, 4) AS mean_idx,
             count(DISTINCT val)::BIGINT AS n_colors,
             sum(CASE WHEN top THEN val ELSE 0 END)::BIGINT AS top_row_sum
      FROM v GROUP BY doc_id, w, h""".stripMargin),
    (spark, dir) =>
      Multimodal.gifStats(spark, t(spark, dir, "documents"))
        .toDF()
        .select(col("doc_id"), col("width"), col("height"), col("n_px"),
          Det.r4e(col("sum_idx").cast("double") / col("n_px")).as("mean_idx"),
          col("n_colors"), col("top_row_sum")))

  val audioSpectrum = Q(
    "mm_audio_spectrum",
    "REAL spectral analysis over the decoded audio — the feature-extract " +
      "stage after the codec: the first 64 PCM samples of each document's " +
      "WAV payload (chunk-walked and sign-extended by graft.multimodal." +
      "Wav.decodeWindow, zero-padded when shorter) go through a fast " +
      "Walsh-Hadamard transform (the O(n log n) butterfly in graft." +
      "multimodal.Walsh), and the features are the DC term, the dominant " +
      "non-DC sequency (max |coef|, smallest-k tie-break) and the total " +
      "spectral energy (sum of squared coefficients; Parseval pins it to " +
      "64x the window's sample energy). Walsh basis values are +-1, so " +
      "every coefficient is an EXACT integer: the JVM butterfly and the " +
      "oracle's naive O(n^2) sum-over-popcount closed form must agree " +
      "bit-for-bit, with no rounding step anywhere — a mis-wired " +
      "butterfly stage or a sign-extension bug flips exact bigints, not " +
      "epsilons. ASCII contract as mm_pixel_stats. One scan, zero " +
      "exchanges; payload bytes never shuffle, only the fixed-width " +
      "feature row leaves the scan stage.",
    Some("""
      WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS len
                 FROM documents
                 WHERE length(text) > 0
                   AND octet_length(encode(text)) = length(text)),
           s AS (SELECT doc_id, least(len, 64)::BIGINT AS n_used, i,
                        ascii(substr(text, (i + 1)::INT, 1)) * 257 - 32768 AS amp
                 FROM (SELECT doc_id, text, len,
                              unnest(range(0, least(len, 64))) AS i
                       FROM d)),
           c AS (SELECT s.doc_id, s.n_used, ks.k,
                        sum(amp * (1 - 2 * (bit_count(i & ks.k) % 2)))::BIGINT AS coef
                 FROM s, (SELECT unnest(range(0, 64)) AS k) ks
                 GROUP BY s.doc_id, s.n_used, ks.k),
           dom AS (SELECT doc_id, k, coef,
                          row_number() OVER (PARTITION BY doc_id
                                             ORDER BY abs(coef) DESC, k ASC) AS rn
                   FROM c WHERE k >= 1),
           agg AS (SELECT doc_id, any_value(n_used) AS n_used,
                          sum(coef * coef)::BIGINT AS energy,
                          sum(CASE WHEN k = 0 THEN coef END)::BIGINT AS dc
                   FROM c GROUP BY doc_id)
      SELECT a.doc_id, a.n_used, a.dc, m.k::BIGINT AS dominant_k,
             m.coef AS dominant_coef, a.energy
      FROM agg a JOIN dom m ON m.doc_id = a.doc_id AND m.rn = 1""".stripMargin),
    (spark, dir) =>
      Multimodal.audioSpectrum(spark, t(spark, dir, "documents"))
        .toDF()
        .select(col("doc_id"), col("n_used"), col("dc"), col("dominant_k"),
          col("dominant_coef"), col("energy")))

  val audioHamming = Q(
    "mm_audio_hamming",
    "Hamming-tolerant AUDIO near-dup pairs — completes the near-dup " +
      "modality triangle (text: dedup_simhash_hamming; image: " +
      "mm_phash_hamming; audio: this): each decoded WAV window's 64 " +
      "Walsh coefficients collapse to a 64-bit sign fingerprint (bit k " +
      "= coef_k > 0 — exact integer compares, engine-identical bits), " +
      "and near-dups are pairs within Hamming distance 3, found WITHOUT " +
      "an all-pairs product by the same Manku 4-chunk pigeonhole: " +
      "candidates come from capped bucket equi-joins on (chunk_index, " +
      "16-bit chunk_value), only candidates pay the popcount(xor) " +
      "check. Decode+transform runs ONCE into a materialized (doc_id, " +
      "fp) frame; at 100 TB only (id, fp) pairs shuffle, payloads never " +
      "leave their scan partitions, the bucket cap (mirrored in the " +
      "oracle) bounds a degenerate hot chunk. Duplicate documents give " +
      "identical fingerprints, so the corpus guarantees hits at " +
      "Hamming 0; near-identical audio lands at small positive " +
      "distances exactly as the planted-recall leg in WalshSpec's " +
      "fingerprint tests shows.",
    Some("""
      WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS len
                 FROM documents
                 WHERE length(text) > 0
                   AND octet_length(encode(text)) = length(text)),
           s AS (SELECT doc_id, i,
                        ascii(substr(text, (i + 1)::INT, 1)) * 257 - 32768 AS amp
                 FROM (SELECT doc_id, text, len,
                              unnest(range(0, least(len, 64))) AS i
                       FROM d)),
           c AS (SELECT s.doc_id, ks.k,
                        sum(amp * (1 - 2 * (bit_count(i & ks.k) % 2)))::BIGINT AS coef
                 FROM s, (SELECT unnest(range(0, 64)) AS k) ks
                 GROUP BY s.doc_id, ks.k),
           fp AS (SELECT doc_id,
                         sum(CASE WHEN coef > 0
                             THEN CASE WHEN k = 63
                                  THEN (-9223372036854775807 - 1)
                                  ELSE 1::BIGINT << k END
                             ELSE 0 END)::BIGINT AS fp
                  FROM c GROUP BY doc_id),
           chunks AS (SELECT doc_id, fp.fp, ch.chunk,
                             (fp.fp >> (16*ch.chunk)) & 65535 AS key
                      FROM fp, (VALUES (0),(1),(2),(3)) ch(chunk)),
           ok AS (SELECT chunk, key FROM chunks GROUP BY chunk, key
                  HAVING count(*) > 1 AND count(*) <= 1000),
           cand AS (
             SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                    a.fp AS fa, b.fp AS fb
             FROM chunks a
             JOIN chunks b ON a.chunk = b.chunk AND a.key = b.key
                          AND a.doc_id < b.doc_id
             JOIN ok ON ok.chunk = a.chunk AND ok.key = a.key)
      SELECT doc_a, doc_b, bit_count(xor(fa, fb))::BIGINT AS hamming
      FROM cand
      WHERE bit_count(xor(fa, fb)) <= 3""".stripMargin),
    (spark, dir) => {
      val fp = Q.materialize(
        Multimodal.audioFingerprints(spark, t(spark, dir, "documents"))
          .toDF("doc_id", "fp"))
      val chunkStructs = (0 until 4).map(c =>
        struct(lit(c).as("band"),
          shiftright(col("fp"), 16 * c).bitwiseAND(lit(65535L)).as("key")))
      val keyed = fp.select(
        struct(col("doc_id"), col("fp")).as("m"),
        explode(array(chunkStructs: _*)).as("ck"))
        .select(col("ck.band").as("band"), col("ck.key").as("key"), col("m"))
      val hamming = bit_count(col("fa").bitwiseXOR(col("fb")))
      Lsh.bucketPairs(keyed)
        .select(col("p.a.doc_id").as("doc_a"), col("p.b.doc_id").as("doc_b"),
          col("p.a.fp").as("fa"), col("p.b.fp").as("fb"))
        .distinct()
        .filter(hamming <= 3)
        .select(col("doc_a"), col("doc_b"), hamming.cast("long").as("hamming"))
    })

  val videoStats = Q(
    "mm_video_stats",
    "REAL video-container decode — completes the image/audio/video trio " +
      "of dependency-free codecs (RIFF AVI, uncompressed 24-bit DIB " +
      "frames): each document's bytes become an actual multi-frame AVI " +
      "whose NESTED chunk tree (LIST hdrl holding avih + LIST strl with " +
      "strh/strf, LIST movi holding the '00db' frames, a trailing idx1 " +
      "index, and a JUNK alignment chunk on odd-length docs) is what " +
      "distinguishes this parse from the flat WAV walk. " +
      "graft.multimodal.Avi recursively walks the LIST tree, " +
      "cross-validates avih geometry against strf and the declared frame " +
      "count against the movi payload, and decodes SAMPLED frames only " +
      "(step 2 — every chunk header is still walked, but pixel loops run " +
      "for even frame indices only: the every-k-th-frame ingest " +
      "economics the mm_frame_sample stub gestured at, now on a real " +
      "container). One row per sampled frame with exact channel sums; " +
      "oracle is the synthesis closed form (frame f byte j = text byte " +
      "(j+f) mod len; channel order B,G,R — a frame-shift or channel " +
      "confusion breaks the sums). ASCII contract as mm_pixel_stats. " +
      "One scan, zero exchanges; container bytes never shuffle.",
    Some("""
      WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS len
                 FROM documents
                 WHERE length(text) > 0
                   AND octet_length(encode(text)) = length(text)),
           g AS (SELECT doc_id, text, len,
                        1 + (len % 19) AS w, 1 + ((len // 19) % 13) AS h,
                        1 + (len % 4) AS nf
                 FROM d),
           fr AS (SELECT doc_id, text, len, w, h, nf,
                         unnest(range(0, nf)) AS f
                  FROM g),
           v AS (SELECT doc_id, w, h, nf, f, j % 3 AS c,
                        ascii(substr(text, ((j + f) % len)::INT + 1, 1)) AS val
                 FROM (SELECT doc_id, text, len, w, h, nf, f,
                              unnest(range(0, 3*w*h)) AS j
                       FROM fr WHERE f % 2 = 0))
      SELECT doc_id, f::BIGINT AS frame_idx, w::BIGINT AS width,
             h::BIGINT AS height, nf::BIGINT AS n_frames,
             (w*h)::BIGINT AS n_px,
             round(sum(CASE WHEN c=0 THEN val END)::DOUBLE / (w*h) + 1e-8, 4) AS mean_b,
             round(sum(CASE WHEN c=1 THEN val END)::DOUBLE / (w*h) + 1e-8, 4) AS mean_g,
             round(sum(CASE WHEN c=2 THEN val END)::DOUBLE / (w*h) + 1e-8, 4) AS mean_r
      FROM v GROUP BY doc_id, f, w, h, nf""".stripMargin),
    (spark, dir) =>
      Multimodal.videoStats(spark, t(spark, dir, "documents"))
        .toDF()
        .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
          col("n_frames"), col("n_px"),
          Det.r4e(col("sum_b").cast("double") / col("n_px")).as("mean_b"),
          Det.r4e(col("sum_g").cast("double") / col("n_px")).as("mean_g"),
          Det.r4e(col("sum_r").cast("double") / col("n_px")).as("mean_r")))

  val videoPhash = Q(
    "mm_video_phash",
    "Video near-dup candidates by per-frame perceptual hash — the video " +
      "face of the blockhash family (mm_phash is per image; this is per " +
      "SAMPLED FRAME of the decoded AVI container): every even-index " +
      "frame gets the 4x4-grid 16-bit blockhash computed on the same " +
      "pixel pass as the channel sums (exact 128-bit integer " +
      "cross-multiplication — engine-identical bits), and frames " +
      "sharing a hash across the corpus are candidate visual-dup " +
      "frames; videos sharing many frame hashes are candidate dup " +
      "VIDEOS. Output: (doc_id, frame_idx, fhash, n_same) — the " +
      "frame-level census a video-dedup verify join consumes, exactly " +
      "as mm_phash's image census feeds image dedup. This path uses " +
      "the idx1 INDEX-SEEK decode (O(sampled frames), entries " +
      "validated against the bytes they point at, both offset " +
      "conventions) where mm_video_stats keeps the full sequential " +
      "walk — the two real ingest postures, spec-pinned to frame " +
      "parity. Decode runs ONCE " +
      "into a materialized key frame; the census aggregates on the " +
      "16-bit key (bounded at 2^bits groups at ANY corpus size) and is " +
      "broadcast back. At 100 TB only (id, idx, hash) rows shuffle; " +
      "container bytes stay in their scan partitions.",
    Some("""
      WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS len
                 FROM documents
                 WHERE length(text) > 0
                   AND octet_length(encode(text)) = length(text)),
           g AS (SELECT doc_id, text, len,
                        1 + (len % 19) AS w, 1 + ((len // 19) % 13) AS h,
                        1 + (len % 4) AS nf
                 FROM d),
           fr AS (SELECT doc_id, text, len, w, h, f
                  FROM (SELECT doc_id, text, len, w, h,
                               unnest(range(0, nf)) AS f
                        FROM g)
                  WHERE f % 2 = 0),
           lum AS (SELECT doc_id, f,
                          ascii(substr(text, ((3*k + f) % len)::INT + 1, 1))
                        + ascii(substr(text, ((3*k + 1 + f) % len)::INT + 1, 1))
                        + ascii(substr(text, ((3*k + 2 + f) % len)::INT + 1, 1)) AS l,
                          ((k % w) * 4 // w) + 4 * ((k // w) * 4 // h) AS blk
                   FROM (SELECT doc_id, text, len, w, h, f,
                                unnest(range(0, w*h)) AS k
                         FROM fr)),
           blocks AS (SELECT doc_id, f, blk, sum(l)::BIGINT AS bs,
                             count(*)::BIGINT AS bn
                      FROM lum GROUP BY doc_id, f, blk),
           tot AS (SELECT doc_id, f, sum(bs)::BIGINT AS ts,
                          sum(bn)::BIGINT AS tn
                   FROM blocks GROUP BY doc_id, f),
           ph AS (SELECT b.doc_id, b.f,
                         sum(CASE WHEN bs * tn > ts * bn
                             THEN 1::BIGINT << blk ELSE 0 END)::BIGINT AS fhash
                  FROM blocks b JOIN tot t
                    ON t.doc_id = b.doc_id AND t.f = b.f
                  GROUP BY b.doc_id, b.f)
      SELECT p.doc_id, p.f::BIGINT AS frame_idx, p.fhash, c.n_same
      FROM ph p JOIN (SELECT fhash, count(*)::BIGINT AS n_same
                      FROM ph GROUP BY fhash) c ON c.fhash = p.fhash""".stripMargin),
    (spark, dir) => {
      val ph = Q.materialize(
        Multimodal.videoFramePhashes(spark, t(spark, dir, "documents"))
          .toDF("doc_id", "frame_idx", "fhash"))
      val census = ph.groupBy(col("fhash"))
        .agg(count(lit(1)).as("n_same"))
      // Bounded at 2^bits rows at any corpus size — broadcast explicitly
      // so the documented plan shape doesn't depend on AQE statistics.
      ph.join(broadcast(census), "fhash")
        .select(col("doc_id"), col("frame_idx"), col("fhash"),
          col("n_same"))
    })

  val crossModal = Q(
    "dedup_cross_modal",
    "CROSS-MODAL dup audit — the catch text dedup cannot make: pairs of " +
      "documents whose IMAGE payloads collide on the production-width " +
      "64-bit perceptual hash (same coarse visual layout) joined with " +
      "their 64-bit text SimHash distance. text_missed marks pairs the " +
      "text pipeline's Hamming<=3 gate (dedup_simhash_hamming) would NOT " +
      "flag — re-encoded or re-captioned visual dups that survive " +
      "text-only dedup. Candidates come from exact 64-bit hash cohorts " +
      "(rare by construction; eligibility census count>1 AND <=cap, cap " +
      "mirrored in the oracle, so a degenerate corpus cannot go " +
      "quadratic), then the pair frame joins the simhash signature table " +
      "on doc_id — equi joins only, ids+hashes on the wire, both decode " +
      "and signature scans run ONCE. The modality composition is the " +
      "point: phash64 comes from the real BMP decode, simhash64 from " +
      "the token stream, and the query is a pure plan-level join of the " +
      "two existing key streams.",
    Some(s"""
      WITH $Phash64Sql,
           ${Dedup.Simhash64Sql},
           okp AS (SELECT phash FROM ph GROUP BY phash
                   HAVING count(*) > 1 AND count(*) <= ${Lsh.MaxBucket}),
           vp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.phash
                  FROM ph a
                  JOIN ph b ON a.phash = b.phash AND a.doc_id < b.doc_id
                  JOIN okp ON okp.phash = a.phash)
      SELECT doc_a, doc_b, phash,
             (CASE WHEN sa.doc_id IS NULL OR sb.doc_id IS NULL THEN -1
                   ELSE bit_count(xor(sa.simhash_lo, sb.simhash_lo))
                      + bit_count(xor(sa.simhash_hi, sb.simhash_hi))
              END)::BIGINT AS text_hamming,
             (sa.doc_id IS NULL OR sb.doc_id IS NULL
            OR bit_count(xor(sa.simhash_lo, sb.simhash_lo))
             + bit_count(xor(sa.simhash_hi, sb.simhash_hi)) > 3)
               AS text_missed
      FROM vp LEFT JOIN sig64 sa ON sa.doc_id = vp.doc_a
              LEFT JOIN sig64 sb ON sb.doc_id = vp.doc_b""".stripMargin),
    (spark, dir) => {
      val ph = Q.materialize(
        Multimodal.phashes64(spark, t(spark, dir, "documents"))
          .toDF("doc_id", "phash"))
      val ok = ph.groupBy(col("phash")).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1 && col("n") <= Lsh.MaxBucket)
        .select(col("phash"))
      // Eligibility census: bounded by distinct colliding hashes —
      // broadcast-sized at any corpus scale.
      val eligible = ph.join(broadcast(ok), "phash")
      val pairs = eligible.as("a").join(eligible.as("b"),
          col("a.phash") === col("b.phash") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.phash").as("phash"))
      val sig = Q.materialize(Dedup.simhash64(spark, dir))
      val ham =
        bit_count(col("sa.simhash_lo").bitwiseXOR(col("sb.simhash_lo"))) +
          bit_count(col("sa.simhash_hi").bitwiseXOR(col("sb.simhash_hi")))
      // LEFT joins: a doc with no tokens has no simhash row, and a
      // visual collision involving it is precisely a pair text dedup
      // CANNOT catch — it must surface as text_missed (hamming -1), not
      // silently vanish through an inner join.
      val noSig = col("sa.doc_id").isNull || col("sb.doc_id").isNull
      pairs.join(sig.as("sa"), col("sa.doc_id") === col("doc_a"), "left")
        .join(sig.as("sb"), col("sb.doc_id") === col("doc_b"), "left")
        .select(col("doc_a"), col("doc_b"), col("phash"),
          when(noSig, lit(-1L)).otherwise(ham.cast("long"))
            .as("text_hamming"),
          (noSig || ham > 3).as("text_missed"))
    })

  val all: Seq[Q] = Seq(decodeStub, frameSample, byteEntropy, pixelStats,
    pngStats, gifStats, jpegStats, jpegColor, phash, phashHamming, wavStats,
    ulawStats, adpcmStats, audioSpectrum, audioHamming, videoStats,
    videoPhash, crossModal)
}
