package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Recall probe for the random-hyperplane-LSH embedding near-dup path
  * (the committed measurement VERDICT r1 asked for): compares the bucketed
  * candidate set against the exhaustive all-pairs cosine ≥ 0.45 truth —
  * computable only at test scale — and asserts the N² plan shapes are gone.
  *
  * Context for the numbers: the test embeddings are isotropic noise, so
  * every ≥ 0.45 pair sits at the extreme tail of random similarity
  * (0.45–0.51 — there are no planted high-cosine dups), which is the
  * hardest regime for sign-LSH (per-bit agreement only 0.648 at θ≈63°).
  * Measured recall with the fixed seeded planes: 9/14 at sf0.01. For the
  * near-dup regime the operator exists for, the same b=32/r=8 banding
  * gives analytic recall 1-(1-p^8)^32 ≥ 0.996 at cosine 0.8. The floor
  * asserted here (≥ 0.5) guards against banding regressions (e.g. key
  * packing or plane-seed drift), not sampling luck — the planes and data
  * are fixed, so the measurement is deterministic.
  */
class EmbeddingLshRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.01"

  private def exactPairs(threshold: Double): Set[(Long, Long)] = {
    val v = Similarity.vecs(spark, dir).localCheckpoint()
    val a = v.select(col("vec_id").as("va"), col("e").as("ae"),
      col("nrm").as("an"))
    val b = v.select(col("vec_id").as("vb"), col("e").as("be"),
      col("nrm").as("bn"))
    a.join(b, col("va") < col("vb"))
      .filter(graft.functions.Vectors.arrDot(col("ae"), col("be")) /
        (col("an") * col("bn")) >= threshold)
      .select(col("va"), col("vb"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("hyperplane candidates recall >=50% of cosine>=0.45 pairs at sf0.01") {
    val truth = exactPairs(0.45)
    assert(truth.nonEmpty)
    val cand = Similarity
      .hyperplaneCandidates(Similarity.vecs(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hit = (truth & cand).size
    info(s"truth=${truth.size}, candidates=${cand.size}, hits=$hit " +
      f"(recall ${hit.toDouble / truth.size}%.2f)")
    assert(hit.toDouble / truth.size >= 0.5,
      s"recall collapsed: $hit of ${truth.size} true pairs in candidate set")
  }

  test("near-dup and histogram plans contain no all-pairs product") {
    Seq("dedup_embedding_cosine", "sim_cosine_histogram").foreach { name =>
      val plan = graft.SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$name:\n$plan")
    }
  }

  test("planted high-cosine near-dups are all recovered (the operating regime)") {
    // The driver embeddings are isotropic noise with no pair above cosine
    // 0.51, so the banding's near-dup regime (cos >= 0.8, analytic recall
    // 1-(1-p^8)^32 >= 0.996) can't be measured on them. Plant it: 200
    // random vectors plus 20 perturbed copies spanning cosine ~0.85-0.99,
    // and require EVERY planted pair with cosine >= 0.8 in the candidate
    // set. Seeded, so deterministic.
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def randVec(scale: Double) = Array.fill(64)(rnd.nextGaussian() * scale)
    val base = (0 until 200).map(i => (i.toLong, randVec(1.0)))
    val dups = (0 until 20).map { i =>
      val noise = randVec(0.3 + 0.02 * i) // cosine ~0.99 down to ~0.85
      ((1000 + i).toLong, base(i)._2.zip(noise).map { case (a, n) => a + n })
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def dot(x: Array[Double], y: Array[Double]) =
        x.zip(y).map { case (p, q) => p * q }.sum
      dot(a, b) / math.sqrt(dot(a, a) * dot(b, b))
    }
    val planted = (0 until 20).map(i =>
      (base(i)._1, dups(i)._1, cos(base(i)._2, dups(i)._2)))
    val highCos = planted.filter(_._3 >= 0.8)
    assert(highCos.size >= 15, s"perturbation too big: $planted")
    val cand = Similarity
      .hyperplaneCandidates((base ++ dups).toDF("vec_id", "e"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = highCos.filterNot(p => cand.contains((p._1, p._2)))
    info(f"planted pairs: ${planted.size}, cos>=0.8: ${highCos.size}, " +
      s"missed: ${missed.size}")
    assert(missed.isEmpty, s"high-cosine near-dups missed by banding: $missed")
  }

  test("verified near-dup output is a subset of the exact result") {
    val exact = exactPairs(0.45)
    val got = graft.SparkEntry.queries("dedup_embedding_cosine")(spark, dir)
      .select(col("vec_a"), col("vec_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH trades recall, never precision: every reported pair must be a
    // true >=0.45 pair.
    assert(got.subsetOf(exact), s"false positives: ${(got -- exact).take(5)}")
  }
}
