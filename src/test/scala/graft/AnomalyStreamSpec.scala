package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams
import graft.streaming.Streams.{BucketScore, Event}

/** anomalyStream vs a sequential Welford fold: under per-type event-time
  * ordered arrival, every closed bucket's (count, baseline size, z,
  * flagged) must equal the prequential reference EXACTLY (same doubles,
  * same fold order — no rounding laundering), under any batch split and
  * under RocksDB.
  */
class AnomalyStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def loadEvents(): Seq[Event] =
    graft.queries.Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .collect().map(r => Event(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
      .sortBy(e => (Streams.micros(e.ts), e.event_id))

  /** Sequential prequential reference: per type, hourly counts in time
    * order; each closing bucket scored against the Welford state of the
    * buckets before it, then folded in. The final open bucket is scored
    * too (the stream flushes it on timeout).
    */
  private def reference(): Map[(String, Long), (Long, Long, Double, Boolean)] = {
    val byType = loadEvents().groupBy(_.event_type)
    byType.flatMap { case (typ, evs) =>
      val buckets = evs.map(e => Streams.micros(e.ts) / 3600000000L * 3600L)
        .foldLeft(Vector.empty[(Long, Long)]) { (acc, h) =>
          if (acc.nonEmpty && acc.last._1 == h)
            acc.init :+ ((h, acc.last._2 + 1))
          else acc :+ ((h, 1L))
        }
      var (n, mean, m2) = (0L, 0.0, 0.0)
      buckets.map { case (h, c) =>
        val sd = if (n >= 2) math.sqrt(m2 / (n - 1)) else 0.0
        val z = if (n >= 2 && sd > 0) (c - mean) / sd else 0.0
        val flagged = n >= 2 && sd > 0 && math.abs(z) >= 3.0
        val row = (typ, h) -> ((c, n, z, flagged))
        val n1 = n + 1; val d = c - mean
        mean += d / n1; m2 += d * (c - mean); n = n1
        row
      }
    }
  }

  private def runStream(nBatches: Int): Map[(String, Long),
      (Long, Long, Double, Boolean)] = {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val evs = loadEvents()
    val maxUs = evs.map(e => Streams.micros(e.ts)).max
    // TTL beyond the 30-day span: a mid-stream timeout would RESET the
    // type's Welford baseline (the documented state-bound trade, same as
    // scd2Stream's history split) — parity needs the baseline unbroken.
    val ttl = 90L * 86400L
    val input = MemoryStream[Event]
    val name = s"anom_${System.nanoTime()}"
    val q = Streams.anomalyStream(spark, input.toDS(), ttlSeconds = ttl)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      evs.grouped((evs.size + nBatches - 1) / nBatches)
        .foreach { b => input.addData(b: _*); q.processAllAvailable() }
      // sentinel batches to advance the watermark and fire the flush
      val sUs = maxUs + (ttl + 86400L) * 1000000L
      input.addData(Event(-1L, Streams.tsOfMicros(sUs), -1L, "zz", 0.0))
      q.processAllAvailable()
      input.addData(Event(-2L, Streams.tsOfMicros(sUs + 1L), -1L, "zz", 0.0))
      q.processAllAvailable()
      spark.table(name).as[BucketScore].collect().toSeq
        .filter(_.event_type != "zz")
        .map(b => (b.event_type, b.hour_epoch) ->
          ((b.n, b.baseline_n, b.z, b.flagged))).toMap
    } finally q.stop()
  }

  test("closed buckets equal the sequential prequential Welford fold") {
    val want = reference()
    val got = runStream(3)
    assert(got.keySet == want.keySet,
      s"missing: ${(want.keySet diff got.keySet).take(3)} " +
        s"extra: ${(got.keySet diff want.keySet).take(3)}")
    val bad = got.collect { case (k, v) if want(k) != v => (k, v, want(k)) }
    assert(bad.isEmpty, s"bucket mismatches (got vs want): ${bad.take(3)}")
    assert(got.values.exists(_._4), "no flagged bucket — census degenerate")
    assert(got.values.count(!_._4) > got.values.count(_._4),
      "most buckets flagged — threshold broken")
  }

  test("batch-split invariance: 7 batches give the same answer") {
    assert(runStream(7) == reference())
  }

  test("RocksDB state store matches the default provider") {
    val keyConf = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(keyConf)
    spark.conf.set(keyConf,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try assert(runStream(3) == reference())
    finally prev match {
      case Some(v) => spark.conf.set(keyConf, v)
      case None => spark.conf.unset(keyConf)
    }
  }
}
