package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CorpusOps

/** pipeline_dsir_select differential test: the distributed importance-
  * resampling scorer must match an independent single-threaded DSIR
  * recomputation (plain Scala maps — no Spark, no SQL) from the same
  * parquet, and the selection must actually FAVOR the target domain
  * (lang='en' over-represented among the top-50 relative to its corpus
  * share — the property the operator exists for).
  */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val docs: Seq[(Long, String, Array[String])] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long"), col("lang"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ").filter(_.nonEmpty)))
      .toSeq

  /** Sequential DSIR: add-1-smoothed unigram log importance ratio, averaged
    * per token, rounded like Det.r4e, top-50 by (score desc, id asc).
    */
  private lazy val reference: Seq[(Long, String, Long, Double)] = {
    val craw = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val ctgt = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((_, lang, ws) <- docs; w <- ws) {
      craw(w) += 1L
      if (lang == "en") ctgt(w) += 1L
    }
    val nraw = craw.values.sum
    val ntgt = ctgt.values.sum
    val v = craw.size.toLong
    val lr = craw.keys.map { w =>
      w -> (math.log(ctgt(w) + 1.0) - math.log((ntgt + v).toDouble)
        - math.log(craw(w) + 1.0) + math.log((nraw + v).toDouble))
    }.toMap
    docs.map { case (id, lang, ws) =>
      val s = ws.iterator.map(lr).sum
      val score = math.rint((s / ws.length + 1e-8) * 1e4) / 1e4
      (id, lang, ws.length.toLong, score)
    }.sortBy { case (id, _, _, sc) => (-sc, id) }.take(50)
  }

  test("distributed DSIR scoring matches the sequential reference") {
    val got = CorpusOps.dsirSelect.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got.length == 50)
    assert(got == reference,
      s"top-50 DSIR selection differs\n got: ${got.take(5)}…\nwant: ${reference.take(5)}…")
  }

  test("selection favors the target domain") {
    val corpusEnFrac = docs.count(_._2 == "en").toDouble / docs.size
    val selEnFrac = reference.count(_._2 == "en") / 50.0
    assert(selEnFrac > corpusEnFrac,
      s"target lang share in selection ($selEnFrac) should exceed corpus share ($corpusEnFrac)")
  }
}
