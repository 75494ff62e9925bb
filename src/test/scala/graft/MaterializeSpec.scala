package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Q.materialize strategy plumbing: the same multi-reference query must
  * produce identical results under every strategy — localCheckpoint (local
  * default), reliable checkpoint (cluster production), persist
  * (recomputable-lineage cache), and none (pure re-evaluation, the
  * semantics baseline the other three must preserve).
  */
class MaterializeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"
  private val ConfKey = "spark.graft.materialize"

  private def runUnder(strategy: String, q: Q = Dedup.lshVerified): Set[String] = {
    spark.conf.set(ConfKey, strategy)
    try q.run(spark, dir)
      .collect().map(_.mkString("|")).toSet
    finally spark.conf.unset(ConfKey)
  }

  test("all materialization strategies agree on dedup_lsh_verified") {
    val baseline = runUnder("none")
    assert(baseline.nonEmpty)
    assert(runUnder("localCheckpoint") == baseline)
    assert(runUnder("persist") == baseline)
    spark.catalog.clearCache()
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set("spark.graft.checkpointDir", ckptDir)
    try assert(runUnder("checkpoint") == baseline)
    finally spark.conf.unset("spark.graft.checkpointDir")
  }

  test("all strategies agree on the iterative dedup_components loop") {
    // The convergence loop routes through materializeLoop (always
    // lineage-cutting): under `persist`/`none` the self-join would
    // otherwise re-double the logical plan every round. This pins both
    // the fallback's correctness and strategy-equivalence for the
    // data-dependent-round-count iterative query (pagerank/label_prop
    // iterate too, but over a fixed round count — the full Verify
    // posture sweeps cover them end to end).
    val baseline = runUnder("none", Dedup.components)
    assert(baseline.nonEmpty)
    assert(runUnder("localCheckpoint", Dedup.components) == baseline)
    assert(runUnder("persist", Dedup.components) == baseline)
    spark.catalog.clearCache()
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set("spark.graft.checkpointDir", ckptDir)
    try assert(runUnder("checkpoint", Dedup.components) == baseline)
    finally spark.conf.unset("spark.graft.checkpointDir")
  }

  test("loop materialization caches SERIALIZED blocks by default") {
    // Round-12 g100 finding: pagerank's |E|-scale edge frame DNF'd under
    // the deserialized localCheckpoint default (uncompressed disk
    // overflow under spark.rdd.compress=false; with compression forced,
    // a heap OOM from deserialized cached rows + 32 tasks' buffers).
    // The fix is the storage level, so this spec pins the level actually
    // used on BOTH materialization paths — a silent revert to
    // deserialized blocks would re-open the scale hole without failing
    // any correctness oracle.
    import org.apache.spark.storage.StorageLevel
    import org.apache.spark.sql.functions.lit
    def newlyPersistedLevels(f: => Unit): Set[StorageLevel] = {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      f
      spark.sparkContext.getPersistentRDDs
        .filter { case (id, _) => !before(id) }
        .values.map(_.getStorageLevel).toSet
    }
    val df = spark.range(1000).toDF("id").withColumn("x", lit(1))
    val loopLevels = newlyPersistedLevels { Q.materializeLoop(df).count() }
    assert(loopLevels.nonEmpty)
    assert(loopLevels.forall(l => !l.deserialized && l.useDisk),
      s"materializeLoop must cache serialized+disk blocks, got $loopLevels")
    val matLevels = newlyPersistedLevels { Q.materialize(df).count() }
    assert(matLevels.nonEmpty && matLevels.forall(!_.deserialized),
      s"materialize must cache serialized blocks, got $matLevels")
    // The measured fallback posture stays reachable and deserialized.
    spark.conf.set("spark.graft.materialize.level", "mem_disk")
    try {
      val fb = newlyPersistedLevels { Q.materializeLoop(df).count() }
      assert(fb.nonEmpty && fb.forall(_.deserialized),
        s"mem_disk fallback must cache deserialized blocks, got $fb")
    } finally spark.conf.unset("spark.graft.materialize.level")
    // Unknown level fails loudly like an unknown strategy does.
    spark.conf.set("spark.graft.materialize.level", "mem_only_turbo")
    try intercept[IllegalArgumentException] { Q.materialize(df).count() }
    finally spark.conf.unset("spark.graft.materialize.level")
  }

  test("unknown strategy fails loudly, not silently") {
    spark.conf.set(ConfKey, "cache-everything")
    try {
      intercept[IllegalArgumentException] {
        Dedup.lshVerified.run(spark, dir).collect()
      }
    } finally spark.conf.unset(ConfKey)
  }
}
