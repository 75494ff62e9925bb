package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** sim_topk_hier_pruned — the hierarchical descent composed with the
  * partition-pruned index layout (VERDICT r10 "What's missing #3": both
  * halves existed, the composition didn't):
  *
  *  - ROW EQUALITY with the shuffle-join form of the SAME descent, on a
  *    corpus wide enough that the adaptive split is live (m = 1, 20
  *    sub-cells): the layout changes the I/O, never the answer;
  *  - m = 0 DEGENERACY on the real sf0.01 table: with one cell per
  *    group the descent collapses to the flat ranking over the adaptive
  *    cells, and the pruned result must still equal the join form;
  *  - PRUNING BOUNDED BY THE DESCENT: the index scan's static partition
  *    filters alone must restrict the listing to (a subset of) the
  *    cells the two-level descent probed — computed independently here
  *    from hierCellRanks — never the full cell directory set.
  */
class HierPrunedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.01"

  /** Deterministic isotropic corpus with live split bits (N = 2000 >
    * KnnSubCellThreshold: m = 1, 20 adaptive cells under 10 groups).
    */
  private lazy val synthDir: String = {
    val dir = graft.TempDirs.create("graft_hierpruned_emb")
    val r = new java.util.Random(20260816L + SparkTestBase.stressSeed)
    val rows = (0L until 2000L).map { id =>
      val v = Array.fill(64)(r.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      (id, v.map(x => (x / n).toFloat), (id % 10).toInt)
    }
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("pruned hier result equals the shuffle-join form (m = 1 corpus)") {
    assertLayoutInvariance(synthDir)
  }

  test("pruned hier result equals the shuffle-join form (sf0.01, m = 0)") {
    assertLayoutInvariance(sfDir)
  }

  private def assertLayoutInvariance(dir: String): Unit = {
    val pruned = Similarity.hierPrunedTopk(spark, dir, batch = 20, nprobe = 2)
      .collect().map(_.toSeq).toSet
    val joined = hierJoinForm(dir, batch = 20, nprobe = 2)
      .collect().map(_.toSeq).toSet
    assert(pruned.nonEmpty, "empty hier-pruned result")
    assert(pruned == joined,
      s"${(pruned -- joined).size} extra, ${(joined -- pruned).size} missing " +
        s"of ${joined.size}")
  }

  /** Same descent, same scoring law, candidates joined (broadcast probe
    * against the full home-assigned corpus) instead of read pruned.
    */
  private def hierJoinForm(dir: String, batch: Int, nprobe: Int) = {
    import org.apache.spark.sql.expressions.Window
    val v = Q.materialize(Similarity.probeVecs(spark, dir))
    val nv = v.count()
    val m = spark.range(1).select(expr(
      s"if(${nv}L <= ${Similarity.KnnSubCellThreshold}L, 0, " +
        s"cast(floor(log2(cast((${nv}L - 1) div " +
        s"${Similarity.KnnSubCellThreshold}L as double))) as int) + 1)"))
      .head.getInt(0)
    val cent = Q.materialize(Similarity.knnCentroids(v))
    val sup = Q.materialize(Similarity.centroidsOver(v, "label"))
    val home = Similarity.hierCellRanks(v, sup, cent, c => c >> m,
      sprobe = 1, p = 1).select(col("vec_id"), col("cell"))
    val cand = v.join(home, "vec_id")
      .select(col("vec_id").as("neighbor_id"), col("cell").as("ccell"),
        col("e").as("ce"), col("nrm").as("cn"))
    val q = Similarity.hierCellRanks(v.filter(col("vec_id") < batch), sup,
        cent, c => c >> m, sprobe = 2, p = nprobe, carry = Seq("e", "nrm"))
      .select(col("vec_id").as("query_id"), col("cell"),
        col("e").as("qe"), col("nrm").as("qn"))
    val scored = broadcast(q)
      .join(cand, col("cell") === col("ccell") &&
        col("neighbor_id") =!= col("query_id"))
      .withColumn("cos_raw",
        graft.functions.Vectors.arrDot(col("qe"), col("ce"))
          / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cos_raw") + lit(1e-9), 6).desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        Det.r4e(col("cos_raw")).as("cosine"))
  }

  test("the pruned listing is bounded by the DESCENT's probe set") {
    val df = Similarity.hierPrunedTopk(spark, synthDir, batch = 3, nprobe = 2)
    val scan = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(
            _.toString.contains("graft_hier_idx")) => s
    }.headOption.getOrElse(fail("no file scan over the hier index layout"))
    assert(scan.partitionFilters.exists(_.toString.contains("cell")),
      s"index scan carries no cell partition filter: ${scan.partitionFilters}")
    val staticFilters = scan.partitionFilters.filterNot(_.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]))
    assert(staticFilters.nonEmpty, "no static partition filter on the scan")
    val prunedDirs = scan.relation.location
      .listFiles(staticFilters, scan.dataFilters)
      .flatMap(_.files.map(_.getPath.getParent.getName)).toSet
    val allDirs = scan.relation.location.inputFiles
      .filter(_.contains("cell=")).map(_.split("cell=")(1).split("/")(0)).toSet
    // Independently recompute the descent's probe set for the batch.
    val v = Q.materialize(Similarity.probeVecs(spark, synthDir))
    val m = 1 // 2000 vectors / threshold 1280 -> one split bit
    val cent = Q.materialize(Similarity.knnCentroids(v))
    val sup = Q.materialize(Similarity.centroidsOver(v, "label"))
    val descent = Similarity.hierCellRanks(
        v.filter(col("vec_id") < 3), sup, cent, c => c >> m,
        sprobe = 2, p = 2)
      .select(col("cell")).collect().map(r => s"cell=${r.get(0)}").toSet
    assert(allDirs.size == 20, s"expected 20 adaptive cell dirs, saw $allDirs")
    assert(prunedDirs.nonEmpty && prunedDirs.subsetOf(descent),
      s"pruned listing $prunedDirs is not bounded by the descent's " +
        s"probe set $descent")
  }
}
