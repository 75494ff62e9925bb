package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Scaling probe for the two row-level DELETE strategies on the snapshot
  * table — the measurement behind the merge-on-read claim: copy-on-write
  * pays O(touched files × file size) at write time, deletion vectors pay
  * O(matched rows); the reader pays the inverse (COW reads plain, DV
  * reads through one anti-join until an optimize purges).
  *
  * Shape: a TEXT CORPUS — documents (doc_id, lang, text) replicated
  * `SPARK_GRAFT_PROBE_REPLICATE` times (re-keyed uniquely) so the
  * payload bytes, not the job overhead, dominate the rewrite — is
  * published range-clustered on doc_id into 32 files; the delete
  * predicate (`doc_id % 1000 = 0`, ~0.1% of rows) is UNIFORM over the
  * key space, so it touches EVERY file — the GDPR worst case for
  * copy-on-write, which must rewrite the whole corpus to drop 0.1% of
  * it, while the DV commit writes ~0.1% worth of addresses. Both
  * strategies run the same predicate on identical fresh tables; the
  * probe then times the post-delete full read (count) of each, plus the
  * metadata-only rowCount and the deferred optimize purge.
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
    val replicate = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPLICATE", "100").toInt
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
    val docs = graft.queries.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val fact = docs.crossJoin(
        spark.range(replicate).select(col("id").as("_rep")))
      .select((col("doc_id") * replicate + col("_rep")).as("doc_id"),
        col("lang"), col("text"))
    val pred = col("doc_id") % 1000 === 0

    def freshTable(): String = {
      val t = graft.TempDirs.create("graft_probe_dv")
      Snapshots.publish(fact.repartitionByRange(32, col("doc_id")), t)
      t
    }

    // Warm the scan path once so neither strategy pays first-read IO.
    fact.write.format("noop").mode("overwrite").save()

    // Bytes a commit WROTE: the files its manifest lists that the
    // previous version's didn't (data or DV parquets). Wall seconds on a
    // 32-core NVMe box undersell the asymmetry — the rewrite hides
    // behind parallel IO at probe sizes — but bytes scale exactly: this
    // is the write-amplification number a 100 TB operator budgets by.
    def newBytes(table: String, v: Int): Long = {
      def files(ver: Int): Set[String] = {
        val s = java.nio.file.Files.readString(java.nio.file.Paths.get(
          table, "_manifests", f"v$ver%05d.json"))
        "g[0-9a-f]{8}-part\\d{5}\\.parquet".r.findAllIn(s).toSet
      }
      (files(v) -- files(v - 1)).toSeq
        .map(n => java.nio.file.Files.size(
          java.nio.file.Paths.get(table, "data", n))).sum
    }

    val tDv = freshTable()
    val (_, dvWrite) = timed(Snapshots.deleteWhereDV(spark, tDv, pred))
    val dvBytes = newBytes(tDv, 2)
    val (dvRows, dvRead) = timed(Snapshots.read(spark, tDv).count())

    val tCow = freshTable()
    val (_, cowWrite) = timed(Snapshots.deleteWhere(spark, tCow, pred))
    val cowBytes = newBytes(tCow, 2)
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
      f"""{"probe":"dv_vs_cow","sf":"$sfDir","table":"documents",""" +
        f""""replicate":$replicate,"rows_kept":$dvRows,""" +
        f""""dv_write_s":$dvWrite%.3f,"cow_write_s":$cowWrite%.3f,""" +
        f""""dv_bytes_written":$dvBytes,"cow_bytes_written":$cowBytes,""" +
        f""""write_amplification":${cowBytes.toDouble / math.max(dvBytes, 1)}%.1f,""" +
        f""""dv_read_s":$dvRead%.3f,"cow_read_s":$cowRead%.3f,""" +
        f""""optimize_purge_s":$purge%.3f,"dv_read_purged_s":$dvReadPurged%.3f}"""
    println(line)
    val out = sys.env.getOrElse("PROBE_DV_OUT", "probe_dv.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
