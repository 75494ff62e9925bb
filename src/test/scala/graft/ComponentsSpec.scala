package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Differential truth for dedup_components: an independent driver-side
  * union-find over the collected verified pairs must produce the identical
  * (doc, canonical) assignment as the distributed label-propagation
  * fixpoint — including singleton docs mapping to themselves.
  */
class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def check(dir: String): Unit = {
    val pairs = Dedup.verifiedPairs(spark, dir)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val docs = graft.queries.Tables.t(spark, dir, "documents")
      .select(col("doc_id")).collect().map(_.getLong(0))

    // Union-find with path compression.
    val parent = scala.collection.mutable.Map(docs.map(d => d -> d): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = docs.map(d => d -> find(d)).toMap

    val got = Dedup.components.run(spark, dir)
      .select(col("doc_id"), col("canonical_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == docs.length, "one row per doc, singletons included")
    assert(got == want, {
      val diff = got.collect { case (d, c) if want(d) != c => (d, c, want(d)) }
      s"label propagation != union-find on ${diff.take(5)}"
    })
    val nClusters = want.values.toSet.size
    info(s"$dir: ${docs.length} docs, ${pairs.length} verified pairs, " +
      s"$nClusters components, ${docs.length - nClusters} dups folded")
    assert(pairs.nonEmpty, "no verified pairs — differential test is vacuous")
  }

  test("distributed components equal union-find truth at sf0.001") {
    check("/root/testdata/sf0.001")
  }

  test("distributed components equal union-find truth at sf0.01") {
    check("/root/testdata/sf0.01")
  }

  test("dedup_keep_best picks the union-find cluster's best-quality member") {
    val dir = "/root/testdata/sf0.001"
    val pairs = Dedup.verifiedPairs(spark, dir)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val docs = graft.queries.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val parent = scala.collection.mutable.Map(docs.map(d => d._1 -> d._1): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // Sequential reference: per-doc quality (the declared rounding), then
    // per-cluster census + (q6 desc, id asc) argmax.
    def q6(text: String): Double = {
      val toks = text.split(" ").filter(_.nonEmpty)
      val q = 0.5 * math.min(toks.length, 200) / 200.0 +
        0.5 * toks.distinct.length / toks.length.toDouble
      BigDecimal(q + 1e-9).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    val byCluster = docs.groupBy { case (id, _) => find(id) }
    val want = byCluster.map { case (canon, members) =>
      val scored = members.map { case (id, text) =>
        (id, text.split(" ").count(_.nonEmpty).toLong, q6(text))
      }
      val best = scored.minBy { case (id, _, q) => (-q, id) }
      (canon, members.length.toLong, scored.map(_._2).sum, best._1, best._3)
    }.toSet
    val got = Dedup.keepBest.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(got == want,
      s"keep-best differs\n got-want: ${(got diff want).take(3)}\n want-got: ${(want diff got).take(3)}")
    // Non-degenerate: at least one real cluster had a choice to make.
    assert(want.exists(_._2 > 1))
  }
}
