package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Warc

/** The WARC/gzip ingest walk. Independent truth: the JDK's own
  * GZIPInputStream/GZIPOutputStream (written by neither side of this
  * codec) — members this encoder writes must decode under the JDK reader,
  * and JDK-written members must decode under this walker. Plus framing
  * adversarial legs (payloads that LOOK like record boundaries), header
  * optional-field skipping, and loud corruption rejects (CRC32, ISIZE,
  * magic, reserved flags, truncation).
  */
class WarcSpec extends AnyFunSuite {

  private def ascii(s: String) = s.getBytes("US-ASCII")

  test("gzip members round-trip and boundaries are preserved") {
    val a = ascii("first member")
    val b = ascii("second, longer member " * 10)
    val c = Array.tabulate(1000)(i => (i * 7 % 256).toByte) // binary
    val stream = Warc.gzipMember(a) ++ Warc.gzipMember(b) ++ Warc.gzipMember(c)
    val members = Warc.gunzipMembers(stream)
    assert(members.length == 3)
    assert(members(0).toSeq == a.toSeq)
    assert(members(1).toSeq == b.toSeq)
    assert(members(2).toSeq == c.toSeq)
  }

  test("JDK GZIPInputStream decodes this encoder's members") {
    val payload = ascii("cross-validation payload " * 7)
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(Warc.gzipMember(payload)))
    assert(in.readAllBytes().toSeq == payload.toSeq)
  }

  test("this walker decodes JDK GZIPOutputStream members") {
    val payload = ascii("jdk-written member " * 11)
    val bos = new java.io.ByteArrayOutputStream
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(payload)
    gz.close()
    val members = Warc.gunzipMembers(bos.toByteArray)
    assert(members.length == 1 && members.head.toSeq == payload.toSeq)
  }

  test("optional header fields (FNAME/FCOMMENT/FEXTRA) are skipped") {
    val payload = ascii("named member")
    val plain = Warc.gzipMember(payload)
    // Splice FEXTRA + FNAME + FCOMMENT between header and deflate body.
    val extra = Array[Byte](3, 0, 'x', 'y', 'z')
    val name = ascii("file.warc") :+ 0.toByte
    val comment = ascii("a comment") :+ 0.toByte
    val crafted = plain.take(10) ++ extra ++ name ++ comment ++ plain.drop(10)
    crafted(3) = (0x04 | 0x08 | 0x10).toByte // FEXTRA|FNAME|FCOMMENT
    val members = Warc.gunzipMembers(crafted)
    assert(members.length == 1 && members.head.toSeq == payload.toSeq)
  }

  test("corruption rejects loudly: CRC, ISIZE, magic, flags, truncation") {
    val good = Warc.gzipMember(ascii("payload under test, long enough " * 4))
    def rejects(bytes: Array[Byte]): Unit =
      assertThrows[IllegalArgumentException](Warc.gunzipMembers(bytes))
    // Flip one bit in the deflate body → CRC32 (or inflate) must catch it.
    val flipped = good.clone()
    flipped(good.length / 2) = (flipped(good.length / 2) ^ 0x10).toByte
    rejects(flipped)
    // Lie about ISIZE.
    val isize = good.clone()
    isize(good.length - 1) = (isize(good.length - 1) ^ 0x01).toByte
    rejects(isize)
    // Lie about CRC.
    val crc = good.clone()
    crc(good.length - 7) = (crc(good.length - 7) ^ 0x01).toByte
    rejects(crc)
    rejects(good.dropRight(3)) // truncated trailer
    rejects(good.take(6)) // truncated header
    val magic = good.clone(); magic(0) = 0x1e.toByte; rejects(magic)
    val flg = good.clone(); flg(3) = 0x20.toByte; rejects(flg) // reserved bit
    val cm = good.clone(); cm(2) = 7.toByte; rejects(cm)
  }

  test("WARC records frame by Content-Length, not by boundary scanning") {
    // The payload CONTAINS a fake record boundary + version line: a
    // scanner-based parser would split here; a length-based one must not.
    val evil = ascii("body\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\nmore")
    val rec = Warc.encodeRecord("response",
      Seq("WARC-Target-URI" -> "http://x"), evil)
    val tail = Warc.encodeRecord("metadata", Seq.empty, ascii("after"))
    val records = Warc.parseRecords(rec ++ tail)
    assert(records.length == 2)
    assert(records(0).warcType == "response")
    assert(records(0).payload.toSeq == evil.toSeq)
    assert(records(1).warcType == "metadata")
  }

  test("malformed WARC framing rejects loudly") {
    val rec = Warc.encodeRecord("response", Seq.empty, ascii("abc"))
    def rejects(bytes: Array[Byte]): Unit =
      assertThrows[IllegalArgumentException](Warc.parseRecords(bytes))
    rejects(ascii("HTTP/1.1 200 OK\r\n\r\n")) // not a WARC version line
    rejects(rec.dropRight(3)) // truncated separator
    // Strip the Content-Length header.
    val s = new String(rec, "US-ASCII").replaceFirst("Content-Length: 3\r\n", "")
    rejects(ascii(s))
  }

  test("capture round-trip: members, records, HTTP unwrap, exact body") {
    val body = ascii("the downloaded page body: <html>42</html>")
    val cap = Warc.decodeCapture(Warc.encodeCapture("http://t/1", body))
    assert(cap.nMembers == 3)
    assert(cap.records.map(_.warcType) == Seq("warcinfo", "request",
      "response"))
    assert(cap.httpStatus == 200)
    assert(cap.body.toSeq == body.toSeq)
    assert(cap.records(1).headers("WARC-Target-URI") == "http://t/1")
  }

  test("synthetic corpus captures decode to the closed form") {
    for (text <- Seq("a", "hello warc world", "z" * 300)) {
      val body = ascii(text)
      val cap = Warc.decodeCapture(Warc.encodeCapture("http://t/x", body))
      assert(cap.nMembers == 3 && cap.records.length == 3)
      assert(cap.body.length == text.length)
      var sum = 0L
      cap.body.foreach(b => sum += b & 0xff)
      assert(sum == text.map(_.toLong).sum)
    }
  }
}
