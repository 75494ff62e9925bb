package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.GraphOps

/** graph_pagerank differential test: the distributed 3-iteration loop must
  * match an independent single-threaded PageRank recomputation from the
  * same tables (plain Scala maps — no Spark, no SQL), and conserve rank
  * mass (the symmetrized graph has no dangling nodes, so Σ rank = 1 at
  * every iteration up to float noise).
  */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val edges: Seq[(Long, Long)] = {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").cast("long"), col("o_custkey").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").cast("long"), col("l_suppkey").cast("long"))
      .collect()
      .flatMap(r => orders.get(r.getLong(0)).map(c => (c, 1000000L + r.getLong(1))))
      .distinct
    (pairs ++ pairs.map { case (c, s) => (s, c) }).toSeq
  }

  private def referencePagerank(iters: Int): Map[Long, Double] = {
    val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.size.toDouble }
    val nodes = deg.keys.toSeq.sorted
    val n = nodes.size.toDouble
    var pr = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val inflow = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => pr(src) / deg(src) }.sum
      }
      pr = nodes.map(v => v -> (0.15 / n + 0.85 * inflow.getOrElse(v, 0.0))).toMap
    }
    pr
  }

  test("distributed 3-iteration pagerank matches the sequential reference") {
    val got = GraphOps.pagerank.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(got.length == 20)
    val ref = referencePagerank(3)
    // The query reports the TOP-20 by rounded ppm with id tie-break; the
    // reference must agree on both membership and values.
    val want = ref.toSeq
      .map { case (v, p) => v -> math.rint((p * 1e6 + 1e-6) * 100) / 100 }
      .sortBy { case (v, p) => (-p, v) }
      .take(20)
    assert(got.toSeq == want)
  }

  test("distributed triangle count matches the sequential set-based reference") {
    // Independent recomputation: supplier co-purchase edges from the same
    // parquet, triangles by brute-force neighbor-set intersection.
    val su = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").cast("long"), col("l_suppkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    // Support >= 5 orders, matching the declared query's edge filter.
    val coEdges = su.groupBy(_._1).values.flatMap { grp =>
      val ss = grp.map(_._2).distinct.sorted
      for (i <- ss.indices; j <- (i + 1) until ss.size) yield (ss(i), ss(j))
    }.groupBy(identity).filter(_._2.size >= 5).keySet
    // (NOT `.collect { case (e, hits) ... => e }`: collect on a Map whose
    // results are pairs REBUILDS a Map, silently collapsing edges that
    // share a first endpoint.)
    val nbrs = (coEdges.toSeq ++ coEdges.toSeq.map(_.swap))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val triCount = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((a, b) <- coEdges; c <- nbrs(a) intersect nbrs(b); if b < c)
      for (n <- Seq(a, b, c)) triCount(n) += 1L
    val want = triCount.toSeq.sortBy { case (n, k) => (-k, n) }.take(20)
    val got = GraphOps.triangles.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got == want, s"top-20 triangle counts differ\n got: $got\nwant: $want")
    assert(got.nonEmpty && got.head._2 > 0, "degenerate: no triangles at all")
  }

  test("distributed 3-round label propagation matches the sequential reference") {
    // Independent recomputation: synchronous LPA with the same
    // deterministic mode (count desc, label asc) over plain Scala maps.
    val nbrs = edges.groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    var lab = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      lab = nbrs.map { case (n, ns) =>
        val counts = ns.groupBy(lab).map { case (l, xs) => l -> xs.size }
        n -> counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }
    }
    val want = lab.values.groupBy(identity)
      .map { case (l, xs) => l -> xs.size.toLong }
      .toSeq.sortBy { case (l, c) => (-c, l) }.take(20)
    val got = GraphOps.labelProp.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got == want, s"top-20 communities differ\n got: $got\nwant: $want")
    // Degenerate guard: propagation actually merged labels (some community
    // holds more than one node).
    assert(got.exists(_._2 > 1), "no community larger than a single node")
  }

  test("rank mass is conserved (no dangling nodes in the symmetrized graph)") {
    for (it <- Seq(1, 3)) {
      val mass = referencePagerank(it).values.sum
      assert(math.abs(mass - 1.0) < 1e-9, s"iteration $it mass $mass")
    }
    // Symmetrization really does give every node out-edges.
    val srcs = edges.map(_._1).toSet
    val dsts = edges.map(_._2).toSet
    assert(srcs == dsts)
  }
}
