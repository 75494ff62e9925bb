package graft

import org.apache.spark.sql.functions.{col, expr}
import org.scalatest.funsuite.AnyFunSuite

/** graft.functions.Lcp (the codegen LCP dedup_substring's window stage
  * runs since round 13) must equal the SQL HOF form it replaced —
  * Dedup.lcpSql, which is also the shape the DuckDB oracle still runs —
  * bit for bit, including the adversarial shapes: empty strings, exact
  * prefixes, multi-byte UTF-8 (mismatch inside a code point must not
  * count the code point), and a scalar reference check on plain ASCII.
  */
class LcpSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def refLcp(a: String, b: String): Long = {
    // Code-point-wise reference (valid-Unicode inputs only).
    val ac = a.codePoints().toArray
    val bc = b.codePoints().toArray
    var i = 0
    while (i < ac.length && i < bc.length && ac(i) == bc(i)) i += 1
    i.toLong
  }

  private val cases: Seq[(String, String)] = {
    val rnd = new scala.util.Random(20260819)
    val ab = "ab"
    val rand = (1 to 200).map { _ =>
      val n = rnd.nextInt(70)
      val m = rnd.nextInt(70)
      (Seq.fill(n)(ab(rnd.nextInt(2))).mkString,
        Seq.fill(m)(ab(rnd.nextInt(2))).mkString)
    }
    val hand = Seq(
      ("", ""), ("", "x"), ("abc", "abc"), ("abc", "abcd"),
      ("abcd", "abc"), ("xbc", "ybc"),
      // multi-byte: é = 2 bytes, 官 = 3 bytes, 𝒳 = 4 bytes
      ("café", "cafés"), ("café", "cafe"),
      ("官官a", "官官b"),
      ("a𝒳z", "a𝒳y"),
      // same first byte, different second byte of a 2-byte code point
      ("é", "ê"))
    rand ++ hand
  }

  test("codegen Lcp == the SQL HOF form == a code-point reference") {
    import spark.implicits._
    val df = cases.toDF("a", "b")
      .withColumn("fast", graft.functions.Lcp(col("a"), col("b")))
      .withColumn("slow", expr(graft.queries.Dedup.lcpSql("a", "b")))
    val rows = df.select("a", "b", "fast", "slow").collect()
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == r.getLong(3),
        s"Lcp('$a','$b'): expression ${r.getLong(2)} != SQL ${r.getLong(3)}")
      assert(r.getLong(2) == refLcp(a, b),
        s"Lcp('$a','$b'): expression ${r.getLong(2)} != ref ${refLcp(a, b)}")
    }
  }

  test("null inputs propagate (the window's boundary rows)") {
    import spark.implicits._
    val df = Seq(("a", Option("a")), ("a", None))
      .toDF("a", "b")
      .withColumn("fast", graft.functions.Lcp(col("a"), col("b")))
    val got = df.select("fast").collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq == Seq(Some(1L), None))
  }
}
