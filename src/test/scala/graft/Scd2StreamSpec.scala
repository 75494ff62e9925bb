package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams
import graft.streaming.Streams.{Event, Scd2Row}

/** scd2Stream vs the batch q_events_scd2 mirror: closed ∪ flushed stream
  * rows must reproduce the batch history exactly under event-time-ordered
  * arrival (the CDC-feed case the operator documents), independently of
  * how arrivals permute WITHIN a micro-batch, and identically under the
  * RocksDB state store.
  */
class Scd2StreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def loadEvents(): Seq[Event] =
    graft.queries.Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .collect().map(r => Event(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
      .sortBy(e => (Streams.micros(e.ts), e.event_id))

  /** (user, version) -> (type, from_s, to_s, n, current); -1 marks open. */
  private def key(rows: Seq[Scd2Row]) = rows.map { r =>
    (r.user_id, r.version_n) ->
      ((r.event_type, Streams.micros(r.valid_from) / 1e6,
        r.valid_to.map(Streams.micros(_) / 1e6).getOrElse(-1.0), r.n_events,
        r.current))
  }.toMap

  // TTL must exceed the corpus's 30-day event span for exact batch parity:
  // a user idle past the ttl is FLUSHED mid-stream (current version emitted,
  // state evicted, numbering restarts) — the documented state-size bound,
  // exercised separately below.
  private val ParityTtl = 90L * 86400L

  private def runStream(batches: Seq[Seq[Event]],
      ttlSeconds: Long = ParityTtl): Map[(Long, Long),
      (String, Double, Double, Long, Boolean)] = {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val maxUs = batches.flatten.map(e => Streams.micros(e.ts)).max
    val input = MemoryStream[Event]
    val name = s"scd2_${System.nanoTime()}"
    val q = Streams.scd2Stream(spark, input.toDS(), ttlSeconds = ttlSeconds)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      // Two far-future sentinel batches: the first advances the watermark
      // past every real user's ttl, the second gives the operator a batch
      // in which those timeouts actually fire and flush open versions.
      val sUs = maxUs + (ttlSeconds + 86400L) * 1000000L
      val s1 = Event(-1L, Streams.tsOfMicros(sUs), -999L, "zz", 0.0)
      val s2 = Event(-2L, Streams.tsOfMicros(sUs + 1L), -999L, "zz", 0.0)
      input.addData(s1); q.processAllAvailable()
      input.addData(s2); q.processAllAvailable()
      val rows = spark.table(name).as[Scd2Row].collect().toSeq
        .filter(_.user_id != -999L)
      key(rows)
    } finally q.stop()
  }

  private def batchWant(): Map[(Long, Long),
      (String, Double, Double, Long, Boolean)] =
    SparkEntry.queries("q_events_scd2")(spark, dir)
      .collect().map { r =>
        (r.getLong(0), r.getLong(1)) ->
          ((r.getString(2), r.getDouble(3),
            if (r.isNullAt(4)) -1.0 else r.getDouble(4), r.getLong(5),
            r.getBoolean(6)))
      }.toMap

  test("closed+flushed stream history equals the batch SCD2 build") {
    val evs = loadEvents()
    val batches = evs.grouped((evs.size + 2) / 3).toSeq
    val got = runStream(batches)
    val want = batchWant()
    assert(got.keySet == want.keySet,
      s"missing: ${(want.keySet diff got.keySet).take(3)} " +
        s"extra: ${(got.keySet diff want.keySet).take(3)}")
    val bad = got.collect { case (k, v) if want(k) != v => (k, v, want(k)) }
    assert(bad.isEmpty, s"version mismatches (got vs want): ${bad.take(3)}")
    assert(got.values.count(_._5) > 0, "no flushed current versions")
    assert(got.values.count(!_._5) > 0, "no closed versions")
  }

  test("within-batch arrival permutation changes nothing") {
    val evs = loadEvents()
    val batches = evs.grouped((evs.size + 2) / 3).toSeq
    val rng = new scala.util.Random(42)
    val permuted = batches.map(b => rng.shuffle(b))
    assert(runStream(permuted) == batchWant())
  }

  test("a short TTL bounds state by splitting idle users' histories") {
    // The state-size trade, exercised: with ttl = 1 hour against a 30-day
    // event span, idle users are flushed mid-stream (current version
    // emitted, state evicted) and their numbering restarts — MORE current
    // rows than users, the documented cost of bounded state.
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val evs = loadEvents()
    val nUsers = evs.map(_.user_id).distinct.size
    val batches = evs.grouped((evs.size + 2) / 3).toSeq
    val input = MemoryStream[Event]
    val name = s"scd2ttl_${System.nanoTime()}"
    val q = Streams.scd2Stream(spark, input.toDS(), ttlSeconds = 3600L)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val flushed = spark.table(name).as[Scd2Row].collect()
        .count(r => r.current && r.user_id != -999L)
      assert(flushed > nUsers,
        s"expected mid-stream flushes beyond the $nUsers users, got $flushed")
    } finally q.stop()
  }

  test("RocksDB state store matches the default provider") {
    val keyConf = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(keyConf)
    spark.conf.set(keyConf,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val evs = loadEvents()
      val batches = evs.grouped((evs.size + 2) / 3).toSeq
      assert(runStream(batches) == batchWant())
    } finally {
      prev match {
        case Some(v) => spark.conf.set(keyConf, v)
        case None => spark.conf.unset(keyConf)
      }
    }
  }
}
