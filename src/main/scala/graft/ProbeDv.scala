package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Scaling probe for the two row-level DELETE strategies on the snapshot
  * table — the measurement behind the merge-on-read claim: copy-on-write
  * pays O(touched files × file size) at write time, deletion vectors pay
  * O(matched rows); the reader pays the inverse (COW reads plain, DV
  * reads through one anti-join until an optimize purges).
  *
  * Shape: lineitem (the SF-scaled fact table) is published range-
  * clustered on l_orderkey into 32 files; the delete predicate
  * (`l_orderkey % 1000 = 0`, ~0.1% of rows) is UNIFORM over the key
  * space, so it touches EVERY file — the GDPR worst case for
  * copy-on-write, which must rewrite the whole table to drop 0.1% of it.
  * Both strategies run the same predicate on identical fresh tables; the
  * probe then times the post-delete full read (count) of each, plus the
  * metadata-only rowCount.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.ProbeDv
  * Prints one JSON line (and writes PROBE_DV_OUT, default probe_dv.json).
  */
object ProbeDv {

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe-dv")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.sources.Snapshots
    val fact = graft.queries.Tables.t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
    val pred = col("l_orderkey") % 1000 === 0

    def freshTable(): String = {
      val t = java.nio.file.Files.createTempDirectory("graft_probe_dv").toString
      Snapshots.publish(fact.repartitionByRange(32, col("l_orderkey")), t)
      t
    }

    // Warm the scan path once so neither strategy pays first-read IO.
    fact.write.format("noop").mode("overwrite").save()

    val tDv = freshTable()
    val (_, dvWrite) = timed(Snapshots.deleteWhereDV(spark, tDv, pred))
    val (dvRows, dvRead) = timed(Snapshots.read(spark, tDv).count())

    val tCow = freshTable()
    val (_, cowWrite) = timed(Snapshots.deleteWhere(spark, tCow, pred))
    val (cowRows, cowRead) = timed(Snapshots.read(spark, tCow).count())

    require(dvRows == cowRows,
      s"strategies disagree: DV kept $dvRows rows, COW kept $cowRows")
    require(Snapshots.rowCount(tDv) == Some(dvRows) &&
      Snapshots.rowCount(tCow) == Some(cowRows),
      "metadata rowCount disagrees with the scan")

    // And the purge: one optimize over the DV table removes the masks
    // (and the anti-join) — the deferred rewrite, timed for the record.
    val (_, purge) = timed(
      Snapshots.optimize(spark, tDv, 512L * 1024 * 1024))
    val (_, dvReadPurged) = timed(Snapshots.read(spark, tDv).count())

    val line =
      f"""{"probe":"dv_vs_cow","sf":"$sfDir","rows_kept":$dvRows,""" +
        f""""dv_write_s":$dvWrite%.3f,"cow_write_s":$cowWrite%.3f,""" +
        f""""dv_read_s":$dvRead%.3f,"cow_read_s":$cowRead%.3f,""" +
        f""""optimize_purge_s":$purge%.3f,"dv_read_purged_s":$dvReadPurged%.3f}"""
    println(line)
    val out = sys.env.getOrElse("PROBE_DV_OUT", "probe_dv.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
