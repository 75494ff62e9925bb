package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Product-quantization checks, both differential against an independent
  * in-memory reimplementation and behavioral on retrieval quality:
  *
  *  1. sim_pq_encode's code per (vector, subspace) must be the true argmin
  *     codeword by squared L2, recomputed from the raw parquet floats in
  *     plain Scala (codebook = per-(subspace, label) means, components
  *     rounded to 6 decimals like the query does) — the whole
  *     explode/broadcast/min-of-struct pipeline validated against 2000
  *     scalar-loop assignments.
  *  2. sim_topk_pq_adc must beat random retrieval against the EXACT
  *     squared-L2 top-5: the test embeddings are isotropic noise (no
  *     cluster structure for a 10-cell label-seeded codebook to exploit),
  *     so absolute recall is modest by design — measured 6/100 at both
  *     SFs vs ~1/100 expected for random top-5 picks. The assert keeps a
  *     margin (≥ 3/100, > 3× random); the run is fully deterministic, so
  *     this is a regression lock, not a statistical bet.
  */
class PqRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** vec_id -> 64-dim double vector, straight from parquet. */
  private def load(dir: String): Map[Long, Array[Double]] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) e",
        "label")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

  private def labels(dir: String): Map[Long, Int] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

  private def d2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  private def round6(x: Double): Double = math.rint((x + 1e-9) * 1e6) / 1e6

  test("sim_pq_encode codes are the true per-subspace argmin (differential)") {
    val dir = "/root/testdata/sf0.001"
    val vecs = load(dir)
    val lbl = labels(dir)
    // Independent codebook: per-(subspace, label) mean subvector, rounded.
    val cb: Map[(Int, Int), Array[Double]] =
      vecs.toSeq.flatMap { case (id, e) =>
        (0 until 4).map(s => (s, lbl(id)) -> e.slice(s * 16, s * 16 + 16))
      }.groupBy(_._1).map { case (k, vs) =>
        val arrs = vs.map(_._2)
        k -> Array.tabulate(16)(i => round6(arrs.map(_(i)).sum / arrs.size))
      }
    val cells = lbl.values.toSet.toSeq.sorted
    val enc = Similarity.pqEncodeQ.run(spark, dir)
      .select("vec_id", "subspace", "code").collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt) -> r.getLong(2).toInt)
      .toMap
    assert(enc.size == vecs.size * 4)
    enc.foreach { case ((id, s), code) =>
      val se = vecs(id).slice(s * 16, s * 16 + 16)
      // argmin with the query's tie-break: rounded distance, then cell.
      val best = cells.minBy(c => (round6(d2(se, cb((s, c)))), c))
      assert(code == best,
        s"vec $id subspace $s: query chose $code, true argmin $best")
    }
  }

  private def recall(dir: String): Int = {
    val vecs = load(dir)
    val queries = vecs.keys.filter(_ < 20)
    val exact: Map[Long, Set[Long]] = queries.map { q =>
      q -> vecs.keys.filter(_ != q).toSeq
        .sortBy(n => (d2(vecs(q), vecs(n)), n)).take(5).toSet
    }.toMap
    val adc = Similarity.topkPqAdc.run(spark, dir)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (k, rs) =>
        k -> rs.map(_.getLong(1)).toSet
      }
    exact.map { case (q, t) => (t & adc.getOrElse(q, Set())).size }.sum
  }

  for (sf <- Seq("0.001", "0.01")) {
    test(s"sim_topk_pq_adc beats random retrieval vs exact L2 top-5 at sf$sf") {
      val hits = recall(s"/root/testdata/sf$sf")
      info(f"sf$sf: ADC recall@5 = $hits/100 (random baseline ~1/100)")
      assert(hits >= 3, s"ADC recall $hits/100 within noise of random")
    }
  }
}
