package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Differential check of pipeline_bpe_fit against a from-scratch in-memory
  * BPE trainer that operates on SYMBOL SEQUENCES (never the space-joined
  * string trick the distributed plan uses) — proving the learned merge
  * table is true Sennrich-style BPE, not an artifact of the string
  * representation.
  */
class BpeFitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** Reference: (pair, merged, count) of the next merge, plus the corpus
    * with that merge applied left-to-right per word.
    */
  private def step(words: Map[Vector[String], Long])
      : ((String, String, Long), Map[Vector[String], Long]) = {
    val pairCounts = scala.collection.mutable.Map[(String, String), Long]()
    words.foreach { case (syms, c) =>
      syms.sliding(2).foreach {
        case Vector(a, b) =>
          pairCounts((a, b)) = pairCounts.getOrElse((a, b), 0L) + c
        case _ =>
      }
    }
    val ((a, b), cnt) = pairCounts.toSeq
      .minBy { case ((x, y), c) => (-c, s"$x $y") }
    val merged = words.toSeq.map { case (syms, c) =>
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      (out.result(), c)
    }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    ((s"$a $b", a + b, cnt), merged)
  }

  for (sf <- Seq("0.001", "0.01")) {
    test(s"all ${TextOps.BpeMerges} learned merges equal a symbol-sequence " +
        s"reference trainer at sf$sf") {
      var words = spark.read
        .parquet(s"/root/testdata/sf$sf/documents.parquet")
        .selectExpr("explode(filter(split(text, ' '), x -> x != '')) AS w")
        .groupBy("w").count()
        .collect()
        .map(r => r.getString(0).split("").toVector -> r.getLong(1))
        .toMap
      val got = TextOps.bpeFit.run(spark, s"/root/testdata/sf$sf")
        .select("rank", "pair", "merged", "cnt")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .sortBy(_._1)
      assert(got.length == TextOps.BpeMerges)
      for (k <- 0 until TextOps.BpeMerges) {
        val (m, next) = step(words)
        assert((got(k)._2, got(k)._3, got(k)._4) == m,
          s"merge ${k + 1}: ${got(k)} != $m")
        words = next
      }
      // Non-degenerate at the full depth: late merges join MULTI-char
      // symbols (the regime the boundary-sentinel form exists for), and
      // some learned token reaches a whole frequent word.
      assert(got.exists { case (_, pair, _, _) =>
        pair.split(' ').forall(_.length >= 2) })
      assert(got.exists(_._3.length >= 5))
    }
  }
}
