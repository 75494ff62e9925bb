package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.US_ASCII
import java.util.zip.{CRC32, ZipEntry, ZipInputStream, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

/** Two-way differential of the hand-parsed PKZIP codec against the JDK's
  * independent java.util.zip implementation, plus the loud-reject
  * contract for untrusted bytes and the EOCD-location edge cases.
  */
class ZipSpec extends AnyFunSuite {

  private def bytes(s: String): Array[Byte] = s.getBytes(US_ASCII)

  private def jdkRead(zip: Array[Byte]): Seq[(String, Array[Byte])] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(zip))
    val out = Seq.newBuilder[(String, Array[Byte])]
    var e = zin.getNextEntry
    while (e != null) {
      out += e.getName -> zin.readAllBytes()
      e = zin.getNextEntry
    }
    zin.close()
    out.result()
  }

  private val sample = Seq(
    ("a.txt", bytes("hello zip world, hello zip world, hello"),
      Zip.MethodDeflated),
    ("b.json", bytes("""{"k":1}"""), Zip.MethodStored),
    ("dir/c.bin", (0 until 999).map(i => (i * 31 % 251).toByte).toArray,
      Zip.MethodDeflated))

  test("roundtrip: own encode -> own decode") {
    val got = Zip.decode(Zip.encode(sample))
    assert(got.map(_.name) == sample.map(_._1))
    got.zip(sample).foreach { case (g, (_, d, m)) =>
      assert(g.method == m)
      assert(g.data.toSeq == d.toSeq)
    }
  }

  test("own encode decodes under the JDK's independent reader") {
    val got = jdkRead(Zip.encode(sample))
    assert(got.map(_._1) == sample.map(_._1))
    got.zip(sample).foreach { case ((_, g), (_, d, _)) =>
      assert(g.toSeq == d.toSeq)
    }
  }

  test("JDK-written archives (deflated + stored + comment) decode here") {
    val bout = new ByteArrayOutputStream
    val zos = new ZipOutputStream(bout)
    zos.setComment("trailing archive comment")
    val e1 = new ZipEntry("x.txt")
    zos.putNextEntry(e1)
    zos.write(bytes("the quick brown fox, the quick brown fox"))
    zos.closeEntry()
    val storedData = bytes("stored-payload")
    val crc = new CRC32
    crc.update(storedData)
    val e2 = new ZipEntry("y.raw")
    e2.setMethod(ZipEntry.STORED)
    e2.setSize(storedData.length.toLong)
    e2.setCompressedSize(storedData.length.toLong)
    e2.setCrc(crc.getValue)
    zos.putNextEntry(e2)
    zos.write(storedData)
    zos.closeEntry()
    zos.close()

    val got = Zip.decode(bout.toByteArray)
    assert(got.map(_.name) == Seq("x.txt", "y.raw"))
    assert(got(0).data.toSeq ==
      bytes("the quick brown fox, the quick brown fox").toSeq)
    assert(got(1).method == Zip.MethodStored)
    assert(got(1).data.toSeq == storedData.toSeq)
  }

  test("stored payload containing the EOCD signature cannot hijack the parse") {
    // 0x06054b50 little-endian = PK\x05\x06 inside member data.
    val trap = Array[Byte]('P', 'K', 5, 6) ++ new Array[Byte](18)
    val zip = Zip.encode(Seq(("trap.bin", trap, Zip.MethodStored)))
    val got = Zip.decode(zip)
    assert(got.head.data.toSeq == trap.toSeq)
  }

  test("loud rejects: corruption, truncation, encryption, bad method") {
    val zip = Zip.encode(sample)

    // Flipped payload byte -> CRC mismatch (first member's data region).
    val flip = zip.clone()
    flip(30 + "a.txt".length + 2) = (flip(30 + "a.txt".length + 2) ^ 0x41).toByte
    val eCrc = intercept[Exception](Zip.decode(flip))
    assert(eCrc.getMessage.contains("CRC") ||
      eCrc.getMessage.contains("deflate"), eCrc.getMessage)

    // Truncated tail -> no EOCD.
    val eTrunc = intercept[IllegalArgumentException](
      Zip.decode(zip.dropRight(3)))
    assert(eTrunc.getMessage.contains("end-of-central-directory"))

    // Trailing junk not declared as a comment -> no consistent EOCD.
    intercept[IllegalArgumentException](
      Zip.decode(zip ++ bytes("junk")))

    // Encrypted flag set in the central record -> reject.
    // Central dir offset from EOCD.
    def le(b: Array[Byte], off: Int, n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v |= (b(off + i) & 0xffL) << (8 * i); i += 1 }; v
    }
    val eocd = zip.length - 22
    val cdOff = le(zip, eocd + 16, 4).toInt
    val enc = zip.clone()
    enc(cdOff + 8) = 1 // flag bit 0
    val eEnc = intercept[IllegalArgumentException](Zip.decode(enc))
    assert(eEnc.getMessage.contains("encrypted"))

    // Unsupported method in the central record -> reject.
    val meth = zip.clone()
    meth(cdOff + 10) = 12 // bzip2
    val eM = intercept[IllegalArgumentException](Zip.decode(meth))
    assert(eM.getMessage.contains("method"))

    // Desynced local header name -> reject before decoding garbage.
    val bad = zip.clone()
    bad(30) = 'z' // first local header's name byte
    val eName = intercept[IllegalArgumentException](Zip.decode(bad))
    assert(eName.getMessage.contains("mismatch"))
  }

  test("sample-archive feature contract") {
    val body = bytes("doc body text here")
    val meta = bytes("""{"lang":"en","n_chars":18}""")
    val smp = Zip.decodeSampleZip(Zip.encodeSampleZip("doc7", body, meta))
    assert(smp.key == "doc7")
    assert(smp.nFiles == 2)
    assert(smp.txtBytes == body.length.toLong)
    assert(smp.txtByteSum == body.map(_ & 0xff).map(_.toLong).sum)
    assert(smp.metaBytes == meta.length.toLong)
  }
}
