package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** sim_topk_ivf_pruned — the IVF index as a partitioned table layout:
  *  - ROW EQUALITY with sim_topk_ivf_probe2 (the shuffle-join form of the
  *    same search): the layout changes the I/O, never the answer;
  *  - PRUNING: a small batch's scan must list ONLY the probed cells'
  *    partition directories (visible both in inputFiles paths and as
  *    PartitionFilters in the executed plan) — the property that makes
  *    the layout the serving shape at 100 TB.
  */
class IvfPrunedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.01"

  test("pruned layout returns exactly the shuffle-join form's rows") {
    val pruned = Similarity.ivfPrunedTopk(spark, dir, batch = 20, nprobe = 2)
      .collect().map(_.toSeq).toSet
    val joined = graft.SparkEntry.queries("sim_topk_ivf_probe2")(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(pruned == joined,
      s"${(pruned -- joined).size} extra, ${(joined -- pruned).size} missing " +
        s"of ${joined.size}")
  }

  test("a small batch reads only its probed cells' partitions") {
    val df = Similarity.ivfPrunedTopk(spark, dir, batch = 3, nprobe = 2)
    // The index scan must carry the probe set as a PARTITION filter (not
    // a data filter — those read footers; partition filters prune the
    // directory listing itself). NOTE df.inputFiles is no evidence here:
    // it lists from the unpruned FileIndex by design.
    val scan = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(
            _.toString.contains("graft_ivf_idx")) => s
    }.headOption.getOrElse(fail("no file scan over the index layout"))
    assert(scan.partitionFilters.exists(_.toString.contains("cell")),
      s"index scan carries no cell partition filter: ${scan.partitionFilters}")
    // Behavioral check: the pruned listing covers at most the 3x2 probed
    // cells' directories out of the 10 label cells. The scan also carries
    // a DynamicPruningSubquery (Spark's runtime DPP over the broadcast
    // probe side — pruning on top of pruning); that one is unevaluable
    // outside execution, so list with the static predicates only: the
    // static isin alone must already bound the listing.
    val staticFilters = scan.partitionFilters.filterNot(_.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]))
    assert(staticFilters.nonEmpty, "no static partition filter on the scan")
    val prunedDirs = scan.relation.location
      .listFiles(staticFilters, scan.dataFilters)
      .flatMap(_.files.map(_.getPath.getParent.getName)).toSet
    val allDirs = scan.relation.location.inputFiles
      .filter(_.contains("cell=")).map(_.split("cell=")(1).split("/")(0)).toSet
    assert(allDirs.size == 10, s"expected 10 cell dirs, saw $allDirs")
    assert(prunedDirs.nonEmpty && prunedDirs.size <= 6,
      s"pruned listing covered $prunedDirs")
  }
}
