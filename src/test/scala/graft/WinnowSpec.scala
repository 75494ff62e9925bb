package graft

import scala.math.BigDecimal.RoundingMode

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** ta_winnow differential: the BIGINT-encoded window-min selection must
  * equal a textbook sequential winnower (explicit per-window scan with
  * the rightmost-min tie rule — no key encoding, so an encoding overflow
  * or an off-by-one in the frame surfaces as a set mismatch), plus the
  * density law and the guarantee the algorithm exists for.
  */
class WinnowSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.01"
  private val K = 5
  private val W = 4

  private def kgramHashes(t: String): Array[Long] =
    (0 to t.length - K).map { i =>
      var h = 0L
      for (j <- 0 until K) h = (h * 31 + t.charAt(i + j).toLong) & 2147483647L
      h
    }.toArray

  /** Textbook robust winnowing: per window, min hash, rightmost on ties;
    * return the selected (pos, hash) set (1-based positions).
    */
  private def winnowRef(hs: Array[Long]): Set[(Long, Long)] = {
    val sel = scala.collection.mutable.Set.empty[(Long, Long)]
    for (s <- 0 to hs.length - W) {
      var best = s
      for (q <- s + 1 until s + W) if (hs(q) <= hs(best)) best = q
      sel += ((best + 1L, hs(best)))
    }
    sel.toSet
  }

  test("selection census equals the textbook sequential winnower") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(org.apache.spark.sql.functions.length(col("text")) >= K + W - 1)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val want = docs.map { case (did, t) =>
      val hs = kgramHashes(t)
      val sel = winnowRef(hs)
      val hashes = sel.map(_._2).toSeq.sorted
      val fp = java.security.MessageDigest.getInstance("MD5")
        .digest(hashes.mkString(",").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val nWin = (hs.length - W + 1).toLong
      val dens = BigDecimal(sel.size.toDouble / nWin + 1e-8)
        .setScale(4, RoundingMode.HALF_UP).toDouble
      did -> ((hs.length.toLong, nWin, sel.size.toLong, dens, fp))
    }.toMap
    val got = SparkEntry.queries("ta_winnow")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getString(5)))).toMap
    assert(got.keySet == want.keySet)
    val bad = got.collect { case (k, v) if want(k) != v => (k, v, want(k)) }
    assert(bad.isEmpty, s"winnow mismatches (got vs want): ${bad.take(3)}")
    // Density law: expected 2/(w+1) = 0.4 for random hashes; corpus mean
    // must sit in a loose band around it — a selection bug (every pos,
    // or one per doc) lands far outside.
    val meanD = got.values.map(_._4).sum / got.size
    assert(meanD > 0.25 && meanD < 0.55, s"mean density $meanD vs 2/(w+1)=0.4")
  }

  test("KgramHash31 equals the higher-order SQL formulation it replaced") {
    // The native expression's semantics are pinned to the oracle's
    // per-position list_reduce fold; this leg proves it against the
    // original aggregate/substring Spark formulation (kept here as the
    // reference, retired from the query for its O(L^2) seek cost).
    import org.apache.spark.sql.functions._
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .filter(length(col("text")) >= 5)
      .select(col("doc_id"), col("text"),
        (length(col("text")) - 4).cast("long").as("n_kgrams"))
    val rows = d.select(col("doc_id"),
      graft.functions.KgramHash31(col("text"), 5).as("fast"),
      expr("transform(sequence(1, n_kgrams), p -> " +
        "aggregate(transform(sequence(0, 4), " +
        "j -> bigint(ascii(substring(text, int(p + j), 1)))), " +
        "bigint(0), (acc, c) -> (acc * 31 + c) & 2147483647))").as("slow"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"doc ${r.getLong(0)}: native k-gram hashes differ from SQL fold")
    }
  }

  test("KgramHash31 folds CODE POINTS on multibyte and supplementary input") {
    // The corpus is ASCII, so the differential legs never exercise the
    // UTF-8 decode path. Pin it directly: 2-byte (é), 3-byte (中) and
    // 4-byte/supplementary (𝄞, U+1D11E) characters must fold as single
    // code points — a UTF-16 charAt fold (surrogate halves) or a
    // byte-wise fold would differ on every case below.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def ref(s: String, k: Int): Seq[Long] = {
      val cps = s.codePoints().toArray
      (0 to cps.length - k).map { p =>
        var h = 0L
        for (j <- 0 until k) h = (h * 31 + cps(p + j)) & 2147483647L
        h
      }
    }
    val cases = Seq("héllo wörld", "中文分词测试", "a𝄞b𝄞c𝄞d", "é", "𝄞𝄞𝄞𝄞𝄞",
      "mixed é中𝄞 ascii", "")
    val got = cases.toDF("t")
      .select(graft.functions.KgramHash31(col("t"), 3).as("h"))
      .collect().map(_.getSeq[Long](0).toSeq)
    cases.zip(got).foreach { case (s, hs) =>
      assert(hs == ref(s, 3), s"code-point fold differs on '$s'")
    }
  }

  test("the winnowing guarantee: shared 8-char substring => shared fingerprint") {
    // The algorithm's contract (Schleimer et al. theorem 1): any match of
    // length >= k + w - 1 is caught by at least one shared selected
    // fingerprint. Planted check: two synthetic docs sharing exactly one
    // 12-char substring must share a selected hash.
    val a = "qqqqqqq SHARED-SPAN-X wwwwwww"
    val b = "zzzzzzzzz SHARED-SPAN-X yyyyy"
    def sel(t: String): Set[Long] = winnowRef(kgramHashes(t)).map(_._2)
    val shared = sel(a).intersect(sel(b))
    assert(shared.nonEmpty, "planted 12-char shared span produced no shared fingerprint")
    // And the sequential reference the differential trusts obeys the
    // density bound on these strings too.
    assert(sel(a).size <= kgramHashes(a).length)
  }
}
