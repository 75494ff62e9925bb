package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the MUTUAL-EDGE THINNING RATIO of sim_knn_clusters (VERDICT
  * r12 #3): the query's 100 TB story rests on "reciprocity thins edges
  * sharply — the per-round component shuffle is |mutual subgraph|, not
  * |corpus|", a claim that was asserted from isotropy, never measured.
  * This main counts the directed kNN edges, the reciprocated (mutual)
  * undirected edges, and the component-loop input size at a given SF dir
  * and prints one JSON line, so the doc comment can carry a measured
  * ratio and the probe ladder can record how it scales.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.ProbeMutual
  */
object ProbeMutual {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe-mutual")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Sessions.quietBoundedWindowWarn()
    val t0 = System.nanoTime()
    val e = Q.materialize(
      Similarity.knnGraphTopk(spark, sfDir, nprobe = 2)
        .select(col("qid"), col("nid")))
    val directed = e.count()
    val mutual = e.join(
        e.select(col("nid").as("qid"), col("qid").as("nid")),
        Seq("qid", "nid"))
      .filter(col("qid") < col("nid"))
    val mutualUndirected = mutual.count()
    val vectors = Similarity.vecs(spark, sfDir).count()
    val sec = (System.nanoTime() - t0) / 1e9
    // reciprocity = directed edges that survive the mutuality filter
    // (each undirected mutual edge accounts for 2 directed edges).
    val ratio = 2.0 * mutualUndirected / math.max(directed, 1L)
    println(f"""{"sf":"$sfDir","vectors":$vectors,""" +
      f""""knn_directed_edges":$directed,""" +
      f""""mutual_undirected_edges":$mutualUndirected,""" +
      f""""reciprocity_ratio":$ratio%.4f,""" +
      f""""component_loop_directed_input":${2 * mutualUndirected},""" +
      f""""sec":$sec%.1f}""")
    spark.stop()
  }
}
