package graft

import scala.collection.mutable

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** dedup_substring differential: the blocked suffix-adjacency census must
  * equal a brute-force reference that compares every duplicated 20-gram
  * occurrence pair directly (no suffix ordering, no adjacency theorem —
  * an independent algorithm, so a hole in the blocking argument or the
  * window-adjacency reduction shows up as a value mismatch, not a shared
  * bug).
  */
class SubstringDupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("blocked adjacency census equals the brute-force pair scan") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(org.apache.spark.sql.functions.length(col("text")) >= 20)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val blocks = mutable.Map.empty[String, mutable.Set[Long]]
    for ((did, t) <- docs; i <- 0 to t.length - 20)
      blocks.getOrElseUpdate(t.substring(i, i + 20), mutable.Set.empty) += did
    val textBy = docs.toMap
    val want = docs.flatMap { case (did, t) =>
      var nDup = 0L
      var best = 0L
      for (i <- 0 to t.length - 20) {
        val b = t.substring(i, i + 20)
        val owners = blocks(b)
        if (owners.size > 1) {
          nDup += 1
          val s = t.substring(i, math.min(i + 64, t.length))
          for (od <- owners if od != did) {
            val ot = textBy(od)
            var j = ot.indexOf(b)
            while (j >= 0) {
              val os = ot.substring(j, math.min(j + 64, ot.length))
              var l = 0
              val m = math.min(s.length, os.length)
              while (l < m && s(l) == os(l)) l += 1
              if (l > best) best = l
              j = ot.indexOf(b, j + 1)
            }
          }
        }
      }
      if (nDup > 0) Some((did, nDup, best)) else None
    }.toSet

    val got = SparkEntry.queries("dedup_substring")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want,
      s"substring census differs\n got-want: ${(got diff want).take(3)}\n" +
        s" want-got: ${(want diff got).take(3)}")
    // Non-degenerate: shared substrings longer than the 20-char block
    // floor exist, and at least one hits the 64-char cap.
    assert(want.exists(_._3 > 20) && want.exists(_._3 == 64))
  }
}
