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
