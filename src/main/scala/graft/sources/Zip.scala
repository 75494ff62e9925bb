package graft.sources

import java.nio.charset.StandardCharsets.US_ASCII
import java.util.zip.{CRC32, Deflater, Inflater}

/** PKZIP (APPNOTE.TXT) archive walk — the third real archive family next
  * to WARC/gzip and WebDataset/ustar, and the one public datasets are most
  * often DISTRIBUTED in (Kaggle exports, HF dataset zips, scraped-site
  * dumps). Unlike tar's sequential headers, ZIP is read from its CENTRAL
  * DIRECTORY at the END of the file: the End-Of-Central-Directory record
  * locates the directory, the directory locates every member's local
  * header, and the authoritative sizes/CRCs live centrally (local headers
  * may carry zeros + a deferred data descriptor, general-purpose flag bit
  * 3 — a streaming writer convention that breaks naive front-to-back
  * readers). That end-anchored index is also what makes a 100 TB corpus of
  * zip shards cheap to INVENTORY: executors read the tail, list entries,
  * and fetch only wanted members.
  *
  * Everything is hand-parsed and loud:
  *
  *   - EOCD located by backward signature scan that must CONSISTENCY-CHECK
  *     (comment length must reach exactly end-of-file) — a payload byte
  *     that happens to contain the signature cannot hijack the parse;
  *   - central directory walked entry-by-entry (signature, name, method,
  *     sizes, local-header offset), entry count and directory size
  *     cross-checked against the EOCD totals;
  *   - each member's LOCAL header re-validated (signature + name must
  *     match the central entry — a desynced offset rejects instead of
  *     decoding garbage), data located after its name+extra fields;
  *   - method 0 (stored) copied, method 8 (deflated) inflated with the
  *     JDK's raw-deflate `Inflater(nowrap=true)`; anything else — and any
  *     ENCRYPTED entry (flag bit 0) — rejects loudly;
  *   - every member's CRC32 and uncompressed size verified against the
  *     central record after decode.
  *
  * The encoder writes the same format (deflate for bodies, stored for
  * already-small metadata, no data descriptors, deterministic fixed
  * timestamps), so ZipSpec differentials run BOTH ways against the JDK's
  * independent java.util.zip implementation.
  */
object Zip {

  final case class Entry(name: String, method: Int, data: Array[Byte])

  private val LocalSig = 0x04034b50L
  private val CentralSig = 0x02014b50L
  private val EocdSig = 0x06054b50L

  val MethodStored = 0
  val MethodDeflated = 8

  private def putLE(out: Array[Byte], off: Int, v: Long, n: Int): Unit = {
    var i = 0
    while (i < n) { out(off + i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
  }

  private def le(b: Array[Byte], off: Int, n: Int): Long = {
    var v = 0L
    var i = 0
    while (i < n) { v |= (b(off + i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  private def crc32(data: Array[Byte]): Long = {
    val c = new CRC32
    c.update(data)
    c.getValue
  }

  private def deflateRaw(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(data)
    d.finish()
    val out = new java.io.ByteArrayOutputStream
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflateRaw(data: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new Inflater(true)
    inf.setInput(data)
    val out = new Array[Byte](expected)
    var got = 0
    try {
      while (got < expected && !inf.finished()) {
        val n = inf.inflate(out, got, expected - got)
        require(n > 0 || !inf.needsInput(), "truncated deflate stream")
        got += n
      }
      require(got == expected, s"inflated $got of $expected bytes")
      // Drain: a stream longer than the declared size is corruption.
      val probe = new Array[Byte](1)
      require(inf.finished() || inf.inflate(probe) == 0,
        "deflate stream longer than declared size")
    } finally inf.end()
    out
  }

  /** Serialize entries as a zip archive: local headers + members, central
    * directory, EOCD. Deterministic (fixed DOS time/date, no extras, no
    * comment). Per-entry method: [[MethodDeflated]] or [[MethodStored]].
    */
  def encode(entries: Seq[(String, Array[Byte], Int)]): Array[Byte] = {
    require(entries.length <= 0xffff, "too many entries for ZIP (no zip64)")
    val out = new java.io.ByteArrayOutputStream
    val central = new java.io.ByteArrayOutputStream
    entries.foreach { case (name, data, method) =>
      require(method == MethodStored || method == MethodDeflated,
        s"unsupported method $method")
      val nameBytes = name.getBytes(US_ASCII)
      require(nameBytes.nonEmpty && nameBytes.length <= 0xffff, "bad name")
      val payload =
        if (method == MethodDeflated) deflateRaw(data) else data
      require(data.length <= 0xffffffffL - 64 &&
        payload.length <= 0xffffffffL - 64, "entry too large (no zip64)")
      val crc = crc32(data)
      val off = out.size()
      require(off <= 0xffffffffL - 64, "archive too large (no zip64)")

      val lh = new Array[Byte](30)
      putLE(lh, 0, LocalSig, 4)
      putLE(lh, 4, 20, 2) // version needed: 2.0
      putLE(lh, 6, 0, 2) // flags: none (sizes known up front)
      putLE(lh, 8, method.toLong, 2)
      putLE(lh, 10, 0x7d1c, 2) // fixed DOS mtime
      putLE(lh, 12, 0x5221, 2) // fixed DOS mdate
      putLE(lh, 14, crc, 4)
      putLE(lh, 18, payload.length.toLong, 4)
      putLE(lh, 22, data.length.toLong, 4)
      putLE(lh, 26, nameBytes.length.toLong, 2)
      putLE(lh, 28, 0, 2) // extra len
      out.write(lh)
      out.write(nameBytes)
      out.write(payload)

      val ch = new Array[Byte](46)
      putLE(ch, 0, CentralSig, 4)
      putLE(ch, 4, 20, 2) // version made by
      putLE(ch, 6, 20, 2) // version needed
      putLE(ch, 8, 0, 2) // flags
      putLE(ch, 10, method.toLong, 2)
      putLE(ch, 12, 0x7d1c, 2)
      putLE(ch, 14, 0x5221, 2)
      putLE(ch, 16, crc, 4)
      putLE(ch, 20, payload.length.toLong, 4)
      putLE(ch, 24, data.length.toLong, 4)
      putLE(ch, 28, nameBytes.length.toLong, 2)
      putLE(ch, 30, 0, 2) // extra
      putLE(ch, 32, 0, 2) // comment
      putLE(ch, 34, 0, 2) // disk start
      putLE(ch, 36, 0, 2) // internal attrs
      putLE(ch, 38, 0, 4) // external attrs
      putLE(ch, 42, off.toLong, 4)
      central.write(ch)
      central.write(nameBytes)
    }
    val cdOff = out.size()
    val cd = central.toByteArray
    out.write(cd)
    val eocd = new Array[Byte](22)
    putLE(eocd, 0, EocdSig, 4)
    putLE(eocd, 4, 0, 2) // disk
    putLE(eocd, 6, 0, 2) // cd start disk
    putLE(eocd, 8, entries.length.toLong, 2)
    putLE(eocd, 10, entries.length.toLong, 2)
    putLE(eocd, 12, cd.length.toLong, 4)
    putLE(eocd, 16, cdOff.toLong, 4)
    putLE(eocd, 20, 0, 2) // comment len
    out.write(eocd)
    out.toByteArray
  }

  /** Locate the EOCD record: backward signature scan from the end, with
    * the consistency check that the declared comment length reaches
    * exactly end-of-file (so a payload byte pattern can't hijack it).
    */
  private def findEocd(b: Array[Byte]): Int = {
    require(b.length >= 22, "too short for a zip archive")
    var pos = b.length - 22
    val floor = math.max(0, b.length - 22 - 0xffff)
    while (pos >= floor) {
      if (le(b, pos, 4) == EocdSig &&
        pos + 22 + le(b, pos + 20, 2) == b.length)
        return pos
      pos -= 1
    }
    throw new IllegalArgumentException("no end-of-central-directory record")
  }

  /** Walk an archive central-directory-first to its decoded entries.
    * Loud rejects: missing/desynced EOCD, count/size mismatches, bad
    * signatures, encrypted entries, unsupported methods, name mismatch
    * between central and local header, CRC/size mismatch after decode.
    */
  def decode(bytes: Array[Byte]): Seq[Entry] = {
    val eocd = findEocd(bytes)
    require(le(bytes, eocd + 4, 2) == 0 && le(bytes, eocd + 6, 2) == 0,
      "multi-disk archives unsupported")
    val nHere = le(bytes, eocd + 8, 2)
    val nTotal = le(bytes, eocd + 10, 2)
    require(nHere == nTotal, "entry count mismatch across disks")
    val cdSize = le(bytes, eocd + 12, 4)
    val cdOff = le(bytes, eocd + 16, 4)
    require(cdOff + cdSize == eocd,
      s"central directory [$cdOff,+$cdSize) does not abut EOCD at $eocd")
    val out = Seq.newBuilder[Entry]
    var pos = cdOff.toInt
    var i = 0L
    while (i < nTotal) {
      require(pos + 46 <= eocd, "truncated central directory")
      require(le(bytes, pos, 4) == CentralSig,
        s"bad central-header signature at $pos")
      val flags = le(bytes, pos + 8, 2)
      require((flags & 0x1) == 0, "encrypted entry unsupported")
      val method = le(bytes, pos + 10, 2).toInt
      require(method == MethodStored || method == MethodDeflated,
        s"unsupported compression method $method")
      val crc = le(bytes, pos + 16, 4)
      val csize = le(bytes, pos + 20, 4)
      val usize = le(bytes, pos + 24, 4)
      require(csize <= Int.MaxValue - 64 && usize <= Int.MaxValue - 64,
        "zip64 sizes unsupported")
      val nameLen = le(bytes, pos + 28, 2).toInt
      val extraLen = le(bytes, pos + 30, 2).toInt
      val commentLen = le(bytes, pos + 32, 2).toInt
      val lhOff = le(bytes, pos + 42, 4).toInt
      require(nameLen > 0, "empty entry name")
      require(pos + 46 + nameLen <= eocd, "truncated central entry name")
      val name = new String(bytes, pos + 46, nameLen, US_ASCII)

      // Re-validate the member's local header before trusting the offset.
      require(lhOff >= 0 && lhOff + 30 <= bytes.length, "bad local offset")
      require(le(bytes, lhOff, 4) == LocalSig,
        s"bad local-header signature at $lhOff for '$name'")
      val lNameLen = le(bytes, lhOff + 26, 2).toInt
      val lExtraLen = le(bytes, lhOff + 28, 2).toInt
      require(lNameLen == nameLen &&
        new String(bytes, lhOff + 30, lNameLen, US_ASCII) == name,
        s"local/central name mismatch for '$name'")
      val dataOff = lhOff + 30 + lNameLen + lExtraLen
      require(dataOff + csize <= bytes.length, "truncated member data")
      val payload = java.util.Arrays.copyOfRange(bytes, dataOff,
        dataOff + csize.toInt)
      val data = method match {
        case MethodStored =>
          require(csize == usize, "stored entry size mismatch")
          payload
        case MethodDeflated => inflateRaw(payload, usize.toInt)
      }
      require(crc32(data) == crc, s"CRC mismatch for '$name'")
      out += Entry(name, method, data)
      pos += 46 + nameLen + extraLen + commentLen
      i += 1
    }
    require(pos == eocd, "central directory size mismatch")
    out.result()
  }

  /** One decoded zip sample — same feature contract as [[Tar.Sample]]. */
  final case class Sample(key: String, nFiles: Int, txtBytes: Long,
      txtByteSum: Long, metaBytes: Long)

  /** Encode one sample archive: `{key}.txt` (document body, DEFLATED —
    * the entropy-coded path) + `{key}.json` (metadata, STORED — both
    * methods exercised in every archive).
    */
  def encodeSampleZip(key: String, body: Array[Byte],
      meta: Array[Byte]): Array[Byte] =
    encode(Seq((s"$key.txt", body, MethodDeflated),
      (s"$key.json", meta, MethodStored)))

  /** Decode a sample archive to its features (ZIP twin of
    * [[Tar.decodeSampleShard]]).
    */
  def decodeSampleZip(bytes: Array[Byte]): Sample = {
    val entries = decode(bytes)
    require(entries.nonEmpty, "empty archive")
    val stems = entries.map(e => e.name.take(e.name.lastIndexOf('.')))
    require(stems.distinct.length == 1,
      s"multiple sample stems: ${stems.distinct}")
    val txt = entries.find(_.name.endsWith(".txt"))
      .getOrElse(throw new IllegalArgumentException("no .txt entry"))
    val meta = entries.find(_.name.endsWith(".json"))
      .getOrElse(throw new IllegalArgumentException("no .json entry"))
    require(txt.method == MethodDeflated && meta.method == MethodStored,
      "unexpected member methods")
    var sum = 0L
    txt.data.foreach(b => sum += b & 0xff)
    Sample(stems.head, entries.length, txt.data.length.toLong, sum,
      meta.data.length.toLong)
  }
}
