package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-attribution probe for the all-vectors kNN join at scale: times
  * each piece of [[graft.queries.Similarity.knnGraphTopk]] in isolation
  * (vector scan, centroid build, cell ranking, candidate scoring, final
  * window) so a super-linear decade slope can be blamed on the right
  * operator instead of guessed at. Prints one JSON line per piece.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.ProbeKnn
  */
object ProbeKnn {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/probe/g1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe-knn")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_AQE", "true"))
      .config("spark.sql.codegen.wholeStage",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_WSCG", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.quietBoundedWindowWarn()
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"""{"piece":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.3f}""")
      r
    }
    import graft.queries.Similarity._
    val v = time("vecs_materialize") {
      val d = queries.Q.materialize(probeVecs(spark, sfDir)
        .withColumn("ee", graft.functions.Vectors.arrDot(col("e"), col("e"))))
      d.count(); d
    }
    val cent = time("centroids") {
      val c = queries.Q.materialize(knnCentroids(v)); c.count(); c
    }
    if (sys.env.contains("SPARK_GRAFT_PROBE_EXPLAIN")) {
      import org.apache.spark.sql.execution.debug._
      val d = cellRanks(v, cent, 2, carry = Seq("e", "ee"))
      println(d.queryExecution.debug.codegenToSeq().map {
        case (subtree, _, _) => "=== WSCG SUBTREE ===\n" + subtree.take(600)
      }.mkString("\n"))
    }
    val ranks = time("cell_ranks_p2") {
      val r = queries.Q.materialize(cellRanks(v, cent, 2, carry = Seq("e", "ee")))
      r.count(); r
    }
    val scored = time("candidate_score") {
      val assign = ranks.filter(col("rk") === 1)
        .select(col("vec_id").as("nid"), col("cell"),
          col("e").as("ne"), col("ee").as("nn"))
      val probes = ranks.select(col("vec_id").as("qid"), col("cell"),
        col("e").as("qe"), col("ee").as("qq"))
      val s = probes.join(assign, "cell")
        .filter(col("qid") =!= col("nid"))
        .select(col("qid"), col("nid"),
          (col("qq") - lit(2) * graft.functions.Vectors.arrDot(
            col("qe"), col("ne")) + col("nn")).as("d2_raw"))
      val m = queries.Q.materialize(s); m.count(); m
    }
    time("topk_window") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("qid"))
        .orderBy(round(col("d2_raw") + lit(1e-9), 6), col("nid"))
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
