package graft

import scala.collection.mutable

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** dedup_lines differential: the digest-keyed corpus-frequency census must
  * equal a brute-force reference built from raw segment STRINGS (no md5, no
  * joins — an independent path, so a digest-collision assumption or a
  * distinct-vs-total document-frequency bug shows up as a value mismatch),
  * plus the conservation and threshold-boundary laws.
  */
class LineDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.01"

  private def brute(): Map[Long, (Long, Long, Long, Long)] = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def segs(t: String): Seq[String] = {
      val ws = t.split(" ", -1)
      (0 until ws.length / 3).map(i => ws.slice(i * 3, i * 3 + 3).mkString(" "))
    }
    // Document frequency counts DISTINCT docs per segment string.
    val df = mutable.Map.empty[String, mutable.Set[Long]]
    for ((did, t) <- docs; s <- segs(t).distinct)
      df.getOrElseUpdate(s, mutable.Set.empty) += did
    docs.map { case (did, t) =>
      val ws = t.split(" ", -1)
      val ss = segs(t)
      val removed = ss.count(s => df(s).size >= 3)
      did -> ((ws.length.toLong, ss.length.toLong, removed.toLong,
        ws.length.toLong - 3L * removed))
    }.toMap
  }

  test("frequency census equals the brute-force string-keyed reference") {
    val want = brute()
    val got = SparkEntry.queries("dedup_lines")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == want.keySet)
    val bad = got.collect { case (k, v) if want(k) != v => (k, v, want(k)) }
    assert(bad.isEmpty, s"mismatches (got vs want): ${bad.take(3)}")
    // Non-degenerate on this corpus: boilerplate exists but does not
    // swallow everything — some docs lose segments, some lose none. (A
    // short doc CAN lose every full segment — that is the operator
    // working, not a law violation.)
    val removed = got.values.map(_._3)
    assert(removed.exists(_ > 0), "no boilerplate removed — census degenerate")
    assert(removed.exists(_ == 0), "every doc lost segments — threshold too low")
    assert(got.values.forall { case (w, segs, rem, ret) =>
      rem <= segs && ret == w - 3 * rem })
  }

  test("threshold boundary: df == 2 segments are never removed") {
    // Rebuild the df histogram and check the removal census honors the
    // >= 3 threshold exactly — a df >= 2 (or > 3) drift would break the
    // brute-force equality above too, but this leg names the law.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val df = mutable.Map.empty[String, mutable.Set[Long]]
    def segs(t: String): Seq[String] = {
      val ws = t.split(" ", -1)
      (0 until ws.length / 3).map(i => ws.slice(i * 3, i * 3 + 3).mkString(" "))
    }
    for ((did, t) <- docs; s <- segs(t).distinct)
      df.getOrElseUpdate(s, mutable.Set.empty) += did
    val hist = df.values.groupBy(_.size).view.mapValues(_.size).toMap
    assert(hist.getOrElse(2, 0) > 0, "no df==2 segments — boundary untested")
    assert(hist.getOrElse(3, 0) > 0, "no df==3 segments — boundary untested")
    val expectRemovedOcc = docs.map { case (_, t) =>
      segs(t).count(s => df(s).size >= 3)
    }.sum
    val gotRemoved = SparkEntry.queries("dedup_lines")(spark, dir)
      .collect().map(_.getLong(3)).sum
    assert(gotRemoved == expectRemovedOcc)
  }
}
