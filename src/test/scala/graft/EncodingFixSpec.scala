package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextOps

/** ta_encoding_fix differential test: the declared query's synthesize →
  * corrupt → repair chain must match an independent Java-String
  * recomputation byte-for-byte (md5 of the repaired text), every doc must
  * round-trip (repair(corrupt(x)) == x), and the mojibake census must be
  * non-degenerate (accents really were injected and really were repaired).
  */
class EncodingFixSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("repair chain matches the sequential reference and round-trips") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextOps.encodingFix.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getLong(3), r.getString(4)))
    assert(got.length == docs.size)
    var mojiTotal = 0L
    for ((id, nMoji, ok, fixedLen, fp) <- got) {
      val t = docs(id)
      val o0 = if (id % 2 == 0) t.replace("er", "ér") else t
      val o = if (id % 3 == 0) o0.replace("on", "ön") else o0
      val c = o.replace("é", "Ã©").replace("ö", "Ã¶")
      val f = c.replace("Ã©", "é").replace("Ã¶", "ö")
        .replace("Ã¼", "ü").replace("Ã±", "ñ")
      assert(ok, s"doc $id failed to round-trip")
      assert(f == o, s"doc $id reference repair differs from original")
      assert(nMoji == (c.length - f.length).toLong, s"doc $id census")
      assert(fixedLen == f.length.toLong, s"doc $id length")
      assert(fp == md5hex(f), s"doc $id fingerprint")
      mojiTotal += nMoji
    }
    assert(mojiTotal > 0, "degenerate: no mojibake was ever synthesized")
    // Both corruption families fired somewhere.
    assert(got.exists { case (id, n, _, _, _) => id % 2 == 0 && n > 0 })
    assert(got.exists { case (id, n, _, _, _) => id % 3 == 0 && n > 0 })
  }
}
