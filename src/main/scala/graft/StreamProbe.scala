package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Streams
import graft.streaming.Streams.Event

/** Streaming SCALE leg (VERDICT r12 #5): StreamBench's state-bound probe
  * stops at 100k input rows — this main runs ONE operator ladder at
  * g-scale input volumes under the production RocksDB provider and
  * records the three things the 100 TB streaming claim rests on:
  *
  *  - state-store size (rows + bytes) at the midpoint and end: the
  *    documented bound is ACTIVE KEYS (users alive inside the TTL
  *    window), not input history — state at 10x the rows must track key
  *    cardinality, not volume;
  *  - throughput (rows/s of input consumed) — roughly flat across the
  *    ladder if per-row cost dominates;
  *  - batch-duration stability: per-batch wall p50/p95/max over the
  *    FIRST and LAST deciles of the run — a state store that degrades
  *    with accumulated history shows it as last-decile inflation even
  *    when the end-of-run state row count looks bounded.
  *
  * The operator is scd2Stream (flatMapGroupsWithState + event-time TTL —
  * the canonical unbounded-key stateful shape). Key cardinality SCALES
  * with volume (users = totalRows / 2000, mirroring how real deployments
  * grow) and event time advances 1 s per row, so a leg spans thousands
  * of TTL windows: linear-in-history state would dwarf the active-key
  * bound by orders of magnitude and the artifact would convict it.
  *
  * Usage: SPARK_GRAFT_STREAM_TOTAL=<rows> [SPARK_GRAFT_STREAM_BATCH=<n>]
  *        runMain graft.StreamProbe        (one JSON line; also written
  *        to STREAM_PROBE_OUT, default stream_probe.json)
  */
object StreamProbe {

  private val Base = 1700000000000L

  def main(args: Array[String]): Unit = {
    val total = sys.env.get("SPARK_GRAFT_STREAM_TOTAL")
      .flatMap(_.toLongOption).getOrElse(1000000L)
    val perBatch = sys.env.get("SPARK_GRAFT_STREAM_BATCH")
      .flatMap(_.toIntOption).getOrElse(50000)
    val ttlSeconds = 7200L
    val users = math.max(total / 2000L, 1L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stream-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.quietBoundedWindowWarn()
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    // user i arrives every `users` rows => within any TTL window (7200
    // event-seconds = 7200 rows) the ACTIVE key set is min(users, 7200).
    def event(i: Long): Event =
      Event(i, new Timestamp(Base + i * 1000L), i % users,
        (i % 10) match {
          case 0 => "purchase"; case 1 | 2 => "view"; case _ => "click"
        },
        (i % 100).toDouble)

    val input = MemoryStream[Event]
    val q = Streams.scd2Stream(spark, input.toDS(), ttlSeconds = ttlSeconds)
      .toDF().writeStream.format("noop").outputMode("append").start()
    val batchSecs = Seq.newBuilder[Double]
    var fed = 0L
    var midRows = 0L
    val t0 = System.nanoTime()
    try {
      var i = 0
      val nBatches = ((total + perBatch - 1) / perBatch).toInt
      while (fed < total) {
        val n = math.min(perBatch.toLong, total - fed).toInt
        val data = (0 until n).map(j => event(fed + j))
        val b0 = System.nanoTime()
        input.addData(data: _*)
        q.processAllAvailable()
        batchSecs += (System.nanoTime() - b0) / 1e9
        fed += n
        i += 1
        if (i == nBatches / 2)
          midRows = Option(q.lastProgress).toSeq
            .flatMap(_.stateOperators).map(_.numRowsTotal).sum
      }
      val secs = (System.nanoTime() - t0) / 1e9
      val ops = Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
      val endRows = ops.map(_.numRowsTotal).sum
      val endBytes = ops.map(_.memoryUsedBytes).sum
      val bs = batchSecs.result()
      def decile(xs: Seq[Double]): String = {
        val s = xs.sorted
        def pct(p: Double) = s(math.min(s.size - 1, (p * s.size).toInt))
        f"""{"p50":${pct(0.5)}%.2f,"p95":${pct(0.95)}%.2f,"max":${s.last}%.2f}"""
      }
      val dec = math.max(bs.size / 10, 1)
      val activeBound = math.min(users, ttlSeconds)
      val line = f"""{"op":"scd2","total_rows":$fed,"users":$users,""" +
        f""""ttl_seconds":$ttlSeconds,"active_key_bound":$activeBound,""" +
        f""""rows_per_sec":${fed / secs}%.0f,"secs":$secs%.1f,""" +
        f""""state_rows_mid":$midRows,"state_rows_end":$endRows,""" +
        f""""state_bytes_end":$endBytes,""" +
        f""""batch_secs_first_decile":${decile(bs.take(dec))},""" +
        f""""batch_secs_last_decile":${decile(bs.takeRight(dec))},""" +
        f""""batches":${bs.size},"per_batch_rows":$perBatch}"""
      println(line)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(
          sys.env.getOrElse("STREAM_PROBE_OUT", "stream_probe.json")),
        (line + "\n").getBytes("UTF-8"))
    } finally {
      q.stop()
      spark.stop()
    }
  }
}
