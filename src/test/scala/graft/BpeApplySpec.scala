package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextOps

/** pipeline_bpe_apply differential test.
  *
  * The distributed apply works on space-joined symbol STRINGS (replace
  * chains, boundary-sentinel form for merge 2); the reference here works
  * on symbol ARRAYS with textbook left-to-right non-overlapping BPE merge
  * semantics. Agreement proves the string encoding introduces no
  * false-match across symbol boundaries (the exact bug the sentinel form
  * exists to prevent) and no missed adjacent merge ('a a a' merges once,
  * 'a b a b' merges twice).
  *
  * Also pins: the merges the apply re-learns are IDENTICAL to
  * pipeline_bpe_fit's published merge table (train→apply consistency).
  */
class BpeApplySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  /** Textbook BPE merge on a symbol array: one left-to-right pass,
    * non-overlapping.
    */
  private def mergeArr(sym: Vector[String], pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < sym.length) {
      if (i + 1 < sym.length && sym(i) == pair._1 && sym(i + 1) == pair._2) {
        out += (sym(i) + sym(i + 1)); i += 2
      } else { out += sym(i); i += 1 }
    }
    out.result()
  }

  private def topPair(freq: Map[Vector[String], Long]): (String, String) =
    freq.toSeq
      .flatMap { case (sym, c) =>
        sym.indices.dropRight(1).map(i => (sym(i), sym(i + 1)) -> c)
      }
      .groupBy(_._1)
      .map { case (p, xs) => p -> xs.map(_._2).sum }
      .toSeq
      .sortBy { case ((x, y), c) => (-c, x + " " + y) }
      .head._1

  /** Learn [[TextOps.BpeMerges]] merges sequentially with the declared
    * total order (count desc, pair asc); returns them in rank order.
    */
  private def learnAll(wordFreq: Map[String, Long]): Vector[(String, String)] = {
    var freq: Map[Vector[String], Long] =
      wordFreq.map { case (w, c) => w.split("").toVector -> c }
    val out = Vector.newBuilder[(String, String)]
    for (_ <- 1 to TextOps.BpeMerges) {
      val p = topPair(freq)
      out += p
      freq = freq.groupBy { case (sym, _) => mergeArr(sym, p) }
        .map { case (sym, xs) => sym -> xs.values.sum }
    }
    out.result()
  }

  test("distributed BPE apply matches the sequential array-based reference " +
      s"at the full ${TextOps.BpeMerges}-merge vocabulary") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
    val wordFreq = docs.flatMap(_._2).groupBy(identity)
      .map { case (w, xs) => w -> xs.size.toLong }
    val merges = learnAll(wordFreq)
    val wordSyms: Map[String, Long] = wordFreq.keys.map { w =>
      w -> merges.foldLeft(w.split("").toVector)(mergeArr).length.toLong
    }.toMap
    val want = docs.map { case (id, ws) =>
      (id, ws.length.toLong, ws.map(_.length.toLong).sum,
        ws.map(wordSyms).sum)
    }.sortBy(_._1).toSeq

    val got = TextOps.bpeApply.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == want, s"per-doc BPE budgets differ\n got: ${got.take(3)}…\nwant: ${want.take(3)}…")
    // Non-degenerate: the merges actually shortened something, and the
    // full vocabulary compresses strictly beyond the first two merges
    // (otherwise the loop depth buys nothing).
    assert(got.exists { case (_, _, nChars, nSym) => nSym < nChars })
    val twoMergeSyms: Map[String, Long] = wordFreq.keys.map { w =>
      w -> merges.take(2).foldLeft(w.split("").toVector)(mergeArr)
        .length.toLong
    }.toMap
    assert(got.map(_._4).sum <
      docs.map(_._2.map(twoMergeSyms).sum).sum)
  }

  test("the merges the apply re-learns equal pipeline_bpe_fit's table") {
    val fit = TextOps.bpeFit.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
    val merges = learnAll(docs.groupBy(identity)
      .map { case (w, xs) => w -> xs.size.toLong })
    assert(fit.map(x => (x._2, x._3)).toSeq ==
      merges.map(p => (p._1 + " " + p._2, p._1 + p._2)))
  }
}
