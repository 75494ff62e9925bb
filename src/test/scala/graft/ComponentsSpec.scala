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
}
