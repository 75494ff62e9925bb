package graft.sources

import java.nio.charset.StandardCharsets.US_ASCII

/** POSIX ustar archive walk — the container of the WebDataset convention
  * (tar shards whose member files group into training samples by name
  * stem: `000123.txt`, `000123.json`, `000123.jpg` → one sample), the
  * de-facto layout for multimodal training shards. A 100 TB corpus of
  * WebDataset shards is readable exactly like WARC: whole-shard bytes to
  * an executor, entries walked locally, only extracted features/columns
  * leave the scan.
  *
  * Everything is hand-parsed and loud:
  *
  *   - 512-byte header blocks: NUL-terminated name, OCTAL size field
  *     (the format detail that trips naive readers — sizes are ASCII
  *     octal, space/NUL padded), `ustar` magic + version check,
  *     typeflag;
  *   - HEADER CHECKSUM validation — the sum of the header bytes with the
  *     checksum field read as spaces; a flipped header byte rejects
  *     loudly instead of mis-sizing every later entry;
  *   - data runs padded to 512-byte boundaries (payload size ≠ stored
  *     size), terminated by two zero blocks.
  *
  * The encoder writes the same format, so WebDatasetSpec round-trips and
  * the DuckDB oracle verifies the closed form; decode rejects truncation,
  * bad magic, checksum mismatch, and non-file typeflags it would
  * otherwise silently skip.
  */
object Tar {

  final case class Entry(name: String, data: Array[Byte])

  private val BlockSize = 512

  /** Write one ASCII-octal numeric field (value + NUL), space-padded. */
  private def putOctal(block: Array[Byte], off: Int, len: Int,
      value: Long): Unit = {
    require(value >= 0, s"negative field $value")
    val s = value.toOctalString
    require(s.length <= len - 1, s"value $value overflows $len-byte field")
    val pad = len - 1 - s.length
    var i = 0
    while (i < pad) { block(off + i) = '0'; i += 1 }
    System.arraycopy(s.getBytes(US_ASCII), 0, block, off + pad, s.length)
    block(off + len - 1) = 0
  }

  /** Parse an ASCII-octal field (digits until NUL/space). */
  private def getOctal(block: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = off
    var seen = false
    // Leading spaces allowed (historic pads).
    while (i < off + len && block(i) == ' ') i += 1
    while (i < off + len && block(i) != 0 && block(i) != ' ') {
      val c = block(i)
      require(c >= '0' && c <= '7', s"bad octal digit '${c.toChar}'")
      v = v * 8 + (c - '0')
      require(v >= 0, "octal field overflow")
      seen = true
      i += 1
    }
    require(seen, "empty octal field")
    v
  }

  /** Header checksum: every header byte summed, the checksum field itself
    * read as ASCII spaces (the ustar definition).
    */
  private def checksumOf(block: Array[Byte], off: Int): Long = {
    var sum = 0L
    var i = 0
    while (i < BlockSize) {
      sum += (if (i >= 148 && i < 156) ' ' else block(off + i) & 0xff)
      i += 1
    }
    sum
  }

  /** Serialize regular-file entries as a ustar archive (headers with
    * validated-format checksums, 512-padded data runs, two-zero-block
    * trailer). Deterministic: fixed mode/uid/gid/mtime.
    */
  def encode(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuilder.make[Byte]
    entries.foreach { case (name, data) =>
      val nameBytes = name.getBytes(US_ASCII)
      require(nameBytes.length > 0 && nameBytes.length <= 100,
        s"entry name length ${nameBytes.length} (1..100 supported)")
      val h = new Array[Byte](BlockSize)
      System.arraycopy(nameBytes, 0, h, 0, nameBytes.length)
      putOctal(h, 100, 8, 420) // mode 0644
      putOctal(h, 108, 8, 0) // uid
      putOctal(h, 116, 8, 0) // gid
      putOctal(h, 124, 12, data.length.toLong)
      putOctal(h, 136, 12, 0) // mtime
      h(156) = '0' // typeflag: regular file
      System.arraycopy("ustar".getBytes(US_ASCII), 0, h, 257, 5)
      h(262) = 0
      h(263) = '0'; h(264) = '0' // version
      // Checksum: 6 octal digits, NUL, space (the canonical layout).
      val sum = checksumOf(h, 0)
      val s = sum.toOctalString.reverse.padTo(6, '0').reverse
      System.arraycopy(s.getBytes(US_ASCII), 0, h, 148, 6)
      h(154) = 0
      h(155) = ' '
      out ++= h
      out ++= data
      val pad = (BlockSize - data.length % BlockSize) % BlockSize
      out ++= new Array[Byte](pad)
    }
    out ++= new Array[Byte](2 * BlockSize)
    out.result()
  }

  /** Walk a ustar archive to its regular-file entries. Loud rejects:
    * truncation, bad magic, checksum mismatch, unsupported typeflag.
    */
  def decode(bytes: Array[Byte]): Seq[Entry] = {
    val out = Seq.newBuilder[Entry]
    var pos = 0
    var done = false
    while (!done) {
      require(pos + BlockSize <= bytes.length, "truncated tar header")
      if ((0 until BlockSize).forall(i => bytes(pos + i) == 0)) {
        // First zero block: require the second, then stop.
        require(pos + 2 * BlockSize <= bytes.length &&
          (0 until BlockSize).forall(i => bytes(pos + BlockSize + i) == 0),
          "missing second terminator block")
        done = true
      } else {
        require(new String(bytes, pos + 257, 5, US_ASCII) == "ustar" &&
          bytes(pos + 262) == 0, "bad ustar magic")
        val stored = getOctal(bytes, pos + 148, 8)
        require(stored == checksumOf(bytes, pos),
          s"header checksum mismatch at $pos")
        var nameLen = 0
        while (nameLen < 100 && bytes(pos + nameLen) != 0) nameLen += 1
        require(nameLen > 0, "empty entry name")
        // POSIX prefix field (offset 345): long paths split as
        // prefix "/" name — silently ignoring it would TRUNCATE names.
        var prefLen = 0
        while (prefLen < 155 && bytes(pos + 345 + prefLen) != 0) prefLen += 1
        val tail = new String(bytes, pos, nameLen, US_ASCII)
        val name = if (prefLen == 0) tail
          else new String(bytes, pos + 345, prefLen, US_ASCII) + "/" + tail
        val size = getOctal(bytes, pos + 124, 12)
        require(size <= Int.MaxValue - 64, s"entry too large: $size")
        val tf = bytes(pos + 156)
        // Regular files decode; directories are structural noise in real
        // tars and are SKIPPED; anything else (links, devices, GNU
        // longname extensions) rejects loudly rather than silently
        // mis-reading the stream.
        require(tf == '0' || tf == 0 || tf == '5',
          s"unsupported typeflag '${tf.toChar}'")
        val dataOff = pos + BlockSize
        require(dataOff + size <= bytes.length, "truncated entry data")
        if (tf != '5')
          out += Entry(name, java.util.Arrays.copyOfRange(bytes, dataOff,
            dataOff + size.toInt))
        val padded = (size + BlockSize - 1) / BlockSize * BlockSize
        pos = dataOff + padded.toInt
      }
    }
    out.result()
  }

  /** One decoded WebDataset sample: entries sharing a name stem. */
  final case class Sample(key: String, nFiles: Int, txtBytes: Long,
      txtByteSum: Long, metaBytes: Long)

  /** Encode one WebDataset-convention sample shard: `{key}.txt` (the
    * document body) + `{key}.json` (metadata), tar'd then wrapped as one
    * gzip member ([[Warc.gzipMember]] — `.tar.gz`, the wire form
    * WebDataset shards ship in).
    */
  def encodeSampleShard(key: String, body: Array[Byte],
      meta: Array[Byte]): Array[Byte] =
    Warc.gzipMember(encode(Seq(s"$key.txt" -> body, s"$key.json" -> meta)))

  /** Decode a `.tar.gz` sample shard: gzip member walk → ustar walk →
    * group by name stem. The synthetic contract is one sample of two
    * files; multi-sample shards are the same walk with more stems.
    */
  def decodeSampleShard(bytes: Array[Byte]): Sample = {
    val members = Warc.gunzipMembers(bytes)
    require(members.length == 1, s"${members.length} gzip members in shard")
    val entries = decode(members.head)
    require(entries.nonEmpty, "empty shard")
    val stems = entries.map(e => e.name.take(e.name.lastIndexOf('.')))
    require(stems.distinct.length == 1,
      s"multiple sample stems in synthetic shard: ${stems.distinct}")
    val txt = entries.find(_.name.endsWith(".txt"))
      .getOrElse(throw new IllegalArgumentException("no .txt entry"))
    val meta = entries.find(_.name.endsWith(".json"))
      .getOrElse(throw new IllegalArgumentException("no .json entry"))
    var sum = 0L
    txt.data.foreach(b => sum += b & 0xff)
    Sample(stems.head, entries.length, txt.data.length.toLong, sum,
      meta.data.length.toLong)
  }
}
