package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** LSH recall probe (the test SURVEY §2.35 commits to): the b=4/r=1
  * multi-band candidate generation must recover EVERY pair whose exact
  * (unblocked) shingle Jaccard is ≥ 0.5 — the threshold the verified dedup
  * pipeline keeps. Recall is measured against the exhaustive all-pairs
  * truth, which is only computable at test scale; the candidate set stays
  * bucketed at any scale.
  *
  * The planted near-dups sit at J ≈ 0.9–0.99, so the per-pair miss
  * probability with 4 independent minhash bands is (1-J)^4 ≲ 1e-4 — with
  * the fixed md5 seeds and driver testdata this is deterministic, and
  * currently exact: recall 1.0 at both SFs (round-1's single-band m0
  * bucketing missed 2 of 25 true pairs at sf0.01).
  */
class LshRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** Exhaustive (unblocked) shingle-Jaccard ≥ 0.5 ground truth — O(N²)
    * worst case, test-scale only.
    */
  private def truthPairs(dir: String): Set[(Long, Long)] = {
    val sh = Dedup.shingles(spark, dir).localCheckpoint()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val common = sh.alias("a")
      .join(sh.alias("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("nc"))
    common
      .join(sizes.alias("sa"), col("da") === col("sa.doc_id"))
      .join(sizes.alias("sb"), col("db") === col("sb.doc_id"))
      .filter(col("nc") / (col("sa.n") + col("sb.n") - col("nc")) >= 0.5)
      .select(col("da"), col("db"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def checkRecall(dir: String): Unit = {
    val truth = truthPairs(dir)
    assert(truth.nonEmpty, s"no true near-dup pairs at $dir — probe is vacuous")
    val cand = Dedup.candidatePairs(spark, dir)
      .select(col("doc_a"), col("doc_b"),
        (col("a_m0") === col("b_m0")).as("band0"))
      .collect()
    val multi = cand.map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = cand.filter(_.getBoolean(2))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = truth -- multi
    info(s"$dir: truth=${truth.size}, multi-band hits=${(truth & multi).size}, " +
      s"single-band (m0) hits=${(truth & single).size}, candidates=${multi.size}")
    assert(missed.isEmpty,
      s"multi-band LSH missed ${missed.size} true pairs: ${missed.take(5)}")
    // The single-band set is definitionally a subset of the union-of-bands.
    assert(single.subsetOf(multi))
  }

  test("multi-band LSH recalls all Jaccard>=0.5 pairs at sf0.001") {
    checkRecall("/root/testdata/sf0.001")
  }

  test("multi-band LSH recalls all Jaccard>=0.5 pairs at sf0.01") {
    checkRecall("/root/testdata/sf0.01")
  }
}
