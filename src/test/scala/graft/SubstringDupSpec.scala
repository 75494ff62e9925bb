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

  test("the block-occurrence cap at its default changes nothing here") {
    // The test SFs' max block occurrence is 9 (measured), far under the
    // 1024 default — so the capped query must be bit-identical to an
    // effectively-uncapped run. A cap that fires spuriously (off-by-one,
    // wrong key) breaks this equality.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val capped = graft.queries.Dedup
      .substringCensus(docs, graft.queries.Dedup.SubstringBlockCap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val uncapped = graft.queries.Dedup
      .substringCensus(docs, Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(capped == uncapped)
  }

  test("planted corpus-wide boilerplate: hot blocks bypass the window, " +
      "census matches the capped contract") {
    import spark.implicits._
    // 40 docs, EVERY one carrying the same 26-char boilerplate (7 blocks,
    // each with 40 occurrences) plus a unique low-dup filler; two docs
    // additionally share a 24-char cold phrase (5 blocks, occ 2). With
    // cap=16 the boilerplate blocks are HOT (40 > 16) and the shared
    // phrase stays COLD.
    val boiler = "THE-SITE-COOKIE-BANNER-26!"          // 26 chars
    require(boiler.length == 26)
    val phrase = "rare shared phrase 24ch."            // 24 chars
    require(phrase.length == 24)
    val docs = (0 until 40).map { i =>
      val filler = s"doc$i " * 8                       // unique per doc
      val extra = if (i == 3 || i == 17) phrase else ""
      (i.toLong, s"$filler$boiler$extra")
    }.toDF("doc_id", "text")
    val cap = 16

    // Sequential reference of the CAPPED contract: hot cross-doc blocks
    // contribute every position at shared length exactly 20; cold blocks
    // get the true (<=64) LCP. Independent of the Spark plan's blocking/
    // window machinery.
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val occ = scala.collection.mutable.Map.empty[String, Int]
    val owners = scala.collection.mutable.Map.empty[String, Set[Long]]
    for ((did, t) <- rows; i <- 0 to t.length - 20) {
      val b = t.substring(i, i + 20)
      occ(b) = occ.getOrElse(b, 0) + 1
      owners(b) = owners.getOrElse(b, Set.empty) + did
    }
    val textBy = rows.toMap
    val want = rows.flatMap { case (did, t) =>
      var nDup = 0L; var best = 0L
      for (i <- 0 to t.length - 20) {
        val b = t.substring(i, i + 20)
        if (owners(b).size > 1) {
          nDup += 1
          if (occ(b) > cap) best = math.max(best, 20L)
          else {
            val s = t.substring(i, math.min(i + 64, t.length))
            for (od <- owners(b) if od != did) {
              val ot = textBy(od)
              var j = ot.indexOf(b)
              while (j >= 0) {
                val os = ot.substring(j, math.min(j + 64, ot.length))
                var l = 0; val m = math.min(s.length, os.length)
                while (l < m && s(l) == os(l)) l += 1
                if (l > best) best = l
                j = ot.indexOf(b, j + 1)
              }
            }
          }
        }
      }
      if (nDup > 0) Some((did, nDup, best)) else None
    }.toSet

    val got = graft.queries.Dedup.substringCensus(docs, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want,
      s"capped census differs\n got-want: ${(got diff want).take(3)}\n" +
        s" want-got: ${(want diff got).take(3)}")

    // The cap's POINT, proven on the data: no cold block (= no window
    // partition) exceeds cap occurrences, while the planted boilerplate
    // really was hot — the window never sees the skewed key.
    val hotBlocks = occ.filter(_._2 > cap).keySet
    assert(hotBlocks.nonEmpty, "planted boilerplate was not hot — " +
      "the leg is not exercising the cap")
    val maxColdOcc = occ.filterNot(kv => hotBlocks(kv._1)).values.max
    assert(maxColdOcc <= cap)
    // The pure-boilerplate blocks are HOT (capped at 20), but the
    // straddle blocks where the filler's shared last digit+space meets
    // the boilerplate (e.g. "0 THE-SITE..." across docs 0/10/20/30,
    // occ=4) stay COLD and preserve their true 2+26=28-char LCP — so
    // every doc reports 28 via a cold block even though the 26-char
    // boilerplate body itself was capped, and the two phrase sharers'
    // cold tail blocks (occ=2) preserve 19+24=43. Exactly the contract:
    // only lengths attainable SOLELY through hot blocks degrade to 20.
    assert(got.filter(t => t._1 == 3L || t._1 == 17L)
      .forall(_._3 == 43L))
    assert(got.filter(t => t._1 != 3L && t._1 != 17L)
      .forall(_._3 == 28L))
  }
}
