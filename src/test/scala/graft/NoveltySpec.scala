package graft

import scala.collection.mutable

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** ta_novelty differential: the distributed first-occurrence census must
  * equal a sequential first-seen scan over docs in doc_id order (raw
  * shingle strings, no md5 — a digest-collision or min-doc bug surfaces
  * as a value mismatch), plus the conservation and boundary laws.
  */
class NoveltySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.01"

  private def r4(x: Double): Double =
    BigDecimal(x + 1e-8).setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  test("novelty census equals the sequential first-seen scan") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1)
    def shingles(t: String): Set[String] = {
      val ws = t.split(" ", -1)
      if (ws.length < 3) Set.empty
      else (0 to ws.length - 3).map(i => ws.slice(i, i + 3).mkString(" ")).toSet
    }
    val seen = mutable.Set.empty[String]
    val want = docs.flatMap { case (did, t) =>
      val sh = shingles(t)
      if (sh.isEmpty) None
      else {
        val novel = sh.count(s => seen.add(s))
        Some(did -> ((sh.size.toLong, novel.toLong,
          r4(novel.toDouble / sh.size))))
      }
    }.toMap
    val got = SparkEntry.queries("ta_novelty")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == want.keySet)
    val bad = got.collect { case (k, v) if want(k) != v => (k, v, want(k)) }
    assert(bad.isEmpty, s"novelty mismatches (got vs want): ${bad.take(3)}")

    // Boundary law: the first document is 100% novel by definition.
    val firstDoc = got.keys.min
    assert(got(firstDoc)._3 == 1.0, s"first doc novelty ${got(firstDoc)._3}")
    // Conservation: novel shingles across docs sum to the global
    // distinct-shingle count — each shingle is novel exactly once.
    val totalNovel = got.values.map(_._2).sum
    val vocab = docs.flatMap(d => shingles(d._2)).toSet.size.toLong
    assert(totalNovel == vocab, s"novel sum $totalNovel != vocab $vocab")
    // Non-degenerate: late docs are not all-novel (boilerplate repeats).
    assert(got.values.exists(_._3 < 1.0), "every doc fully novel — census degenerate")
  }
}
