package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** sim_knn_clusters == union-find over the same mutual edge set (the
  * ComponentsSpec pattern on the vector face): the distributed min-label
  * iteration must agree with a sequential union-find built from the kNN
  * graph the query itself derives from — a propagation bug (missed hop,
  * stale pointer jump) shows as a partition mismatch. The edge input is
  * sim_knn_graph's output, which has its own recall spec and oracle.
  */
class KnnClustersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.01"

  test("min-label clustering equals union-find over mutual edges") {
    val knn = Similarity.knnGraphTopk(spark, dir, nprobe = 2)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mutual = knn.filter { case (a, b) => a < b && knn.contains((b, a)) }
    assert(mutual.nonEmpty, "no reciprocated edges — clustering untestable")

    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- mutual) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val allIds = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id").collect().map(_.getLong(0))
    val want = allIds.map { v =>
      // canonical = min member: union by min root gives exactly that
      v -> (if (parent.contains(v) || mutual.exists(e => e._1 == v || e._2 == v))
        find(v) else v)
    }.toMap

    val got = graft.SparkEntry.queries("sim_knn_clusters")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == want.keySet)
    val bad = got.collect { case (k, v) if want(k) != v => (k, v, want(k)) }
    assert(bad.isEmpty, s"cluster mismatches (got vs want): ${bad.take(3)}")

    // Non-degenerate: real multi-node clusters exist, and the mutuality
    // filter keeps the graph from collapsing into one blob.
    val sizes = got.values.groupBy(identity).map(_._2.size)
    assert(sizes.exists(_ >= 2), "no multi-node cluster")
    assert(sizes.max < allIds.length / 2,
      s"one cluster swallowed ${sizes.max} of ${allIds.length} vectors")
  }
}
