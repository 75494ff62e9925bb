package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream workload over the `events` table: time-bucketed aggregation,
  * gap-based sessionization, JSON extraction, and set operations. The batch
  * formulations here are the oracle-checkable face; `graft.streaming` holds
  * the Structured Streaming equivalents (watermarked windows,
  * flatMapGroupsWithState sessionizer) asserted batch-vs-stream in tests.
  *
  * Time handling: outputs carry `epoch` bigints or formatted strings, never
  * raw timestamps (engine-representation differences). Session gap compares
  * use fractional-second doubles on both engines (Spark `cast(ts as double)`,
  * DuckDB `epoch(ts)`), since `unix_timestamp` truncates sub-second parts.
  */
object EventsOps {
  import Tables.t

  import Det.r2e

  val hourly = Q(
    "q_events_hourly",
    "Tumbling 1-hour aggregation per event type. Group key is " +
      "epoch(date_trunc(hour)) — in streaming this is window($\"ts\", \"1 " +
      "hour\") with a watermark; partial agg applies either way.",
    Some("""
      SELECT epoch(date_trunc('hour', ts))::BIGINT AS hour_epoch,
             event_type,
             count(*) AS n_events,
             round(sum(value) + 1e-6, 2) AS sum_value
      FROM events
      GROUP BY hour_epoch, event_type""".stripMargin),
    (spark, dir) =>
      t(spark, dir, "events")
        .groupBy(
          unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"), r2e(sum(col("value"))).as("sum_value")))

  val sessions = Q(
    "q_events_sessions",
    "Gap-based sessionization (30-min inactivity) via lag + running sum of " +
      "session starts — the standard single-shuffle window formulation. Per " +
      "user: session count, event count, events/session. At scale the " +
      "shuffle is by user_id only; no driver-side state.",
    Some("""
      WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800.0
                      OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      SELECT user_id,
             sum(is_new)::BIGINT AS n_sessions,
             count(*) AS n_events,
             round(count(*) / (1.0 * sum(is_new)) + 1e-6, 2) AS events_per_session
      FROM flagged
      GROUP BY user_id""".stripMargin),
    (spark, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(spark, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("is_new",
          when(col("prev_ts").isNull ||
            col("ts").cast("double") - col("prev_ts").cast("double") > 1800.0,
            lit(1)).otherwise(lit(0)))
        .groupBy(col("user_id"))
        .agg(
          sum(col("is_new")).as("n_sessions"),
          count(lit(1)).as("n_events"),
          r2e(count(lit(1)) / (lit(1.0) * sum(col("is_new"))))
            .as("events_per_session"))
    })

  val json = Q(
    "q_events_json",
    "JSON scalar extraction from the props column, bucketed distribution. " +
      "get_json_object is codegen'd; no UDF.",
    Some("""
      SELECT (json_extract_string(props, '$.k')::BIGINT) % 10 AS k_bucket,
             count(*) AS n_events,
             count(DISTINCT user_id) AS n_users
      FROM events
      GROUP BY k_bucket""".stripMargin),
    (spark, dir) =>
      t(spark, dir, "events")
        .withColumn("k_bucket",
          get_json_object(col("props"), "$.k").cast("long") % 10)
        .groupBy(col("k_bucket"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users")))

  val setops = Q(
    "q_events_setops",
    "Set operations on user cohorts: INTERSECT (clicked AND purchased) and " +
      "EXCEPT (clicked, never purchased). Distinct sets shuffle once each; " +
      "counts are scalars cross-joined into one row.",
    Some("""
      SELECT
        (SELECT count(*) FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
                               INTERSECT
                               SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'))
          AS n_both,
        (SELECT count(*) FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
                               EXCEPT
                               SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'))
          AS n_click_only""".stripMargin),
    (spark, dir) => {
      val ev = t(spark, dir, "events")
      // Each cohort is materialized once: INTERSECT and EXCEPT both read
      // both cohorts, which un-checkpointed meant four scans of events
      // for two distinct sets.
      val clickers = Q.materialize(ev.filter(col("event_type") === "click")
        .select("user_id").distinct())
      val buyers = Q.materialize(ev.filter(col("event_type") === "purchase")
        .select("user_id").distinct())
      val both = clickers.intersect(buyers).agg(count(lit(1)).as("n_both"))
      val clickOnly = clickers.except(buyers)
        .agg(count(lit(1)).as("n_click_only"))
      both.crossJoin(clickOnly)
    })

  val funnel = Q(
    "q_events_funnel",
    "Conversion funnel (view → click → purchase ordered per user): per-user " +
      "stage-minima in one aggregation, then scalar funnel counts. One " +
      "shuffle on user_id; no self-joins.",
    Some("""
      WITH m AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id)
      SELECT count(*) AS n_users,
             count(*) FILTER (WHERE t_view IS NOT NULL AND t_click IS NOT NULL
                                AND t_purchase IS NOT NULL)::BIGINT AS n_all_stages,
             count(*) FILTER (WHERE t_view < t_click
                                AND t_click < t_purchase)::BIGINT AS n_funnel
      FROM m""".stripMargin),
    (spark, dir) => {
      val m = t(spark, dir, "events").groupBy(col("user_id")).agg(
        min(when(col("event_type") === "view", col("ts"))).as("t_view"),
        min(when(col("event_type") === "click", col("ts"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
      m.agg(
        count(lit(1)).as("n_users"),
        sum(when(col("t_view").isNotNull && col("t_click").isNotNull &&
          col("t_purchase").isNotNull, 1).otherwise(0)).cast("long")
          .as("n_all_stages"),
        sum(when(col("t_view") < col("t_click") &&
          col("t_click") < col("t_purchase"), 1).otherwise(0)).cast("long")
          .as("n_funnel"))
    })

  val intervalJoin = Q(
    "q_events_interval_join",
    "Batch interval join — conversion attribution: every click joined to " +
      "the same user's purchases arriving within 30 minutes AFTER it, " +
      "the DECLARED batch face of Streams.attributedConversions (whose " +
      "stream==batch parity StreamsSpec already pins; this row makes the " +
      "batch semantics oracle-checked too). Equi key (user_id) + time-" +
      "range predicate: each side shuffles ONCE by user and the range " +
      "condition evaluates inside the sort-merge join — never a product. " +
      "Sub-second timestamps compare as fractional-second doubles " +
      "(epoch_ms-style), the same convention as sessionization.",
    Some("""
      WITH c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
                 FROM events WHERE event_type = 'click'),
           p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
                        value
                 FROM events WHERE event_type = 'purchase')
      SELECT c.user_id AS user_id, click_id, purchase_id,
             epoch(date_trunc('second', click_ts))::BIGINT AS click_epoch,
             epoch(date_trunc('second', purchase_ts))::BIGINT AS purchase_epoch,
             value
      FROM c JOIN p ON p.user_id = c.user_id
                   AND epoch(purchase_ts) >= epoch(click_ts)
                   AND epoch(purchase_ts) <= epoch(click_ts) + 1800.0""".stripMargin),
    (spark, dir) => {
      val ev = t(spark, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("click_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user_id"),
          col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
          col("value"))
      clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts").cast("double") >= col("click_ts").cast("double") &&
          col("purchase_ts").cast("double") <= col("click_ts").cast("double") + 1800.0)
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          unix_timestamp(col("click_ts")).as("click_epoch"),
          unix_timestamp(col("purchase_ts")).as("purchase_epoch"),
          col("value"))
    })

  val retentionCohorts = Q(
    "q_retention_cohorts",
    "Cohort retention analysis — the product-analytics staple: users " +
      "grouped by first-seen day (their cohort), counted on each " +
      "subsequent active day as an offset from it. Two aggregations and " +
      "an equi join, all keyed by user: distinct (user, day) activity, " +
      "per-user min day, then the (cohort, offset) census. Days are " +
      "epoch-day integers on both engines (date_trunc to UTC midnight " +
      "divides 86400 exactly), so the offset math is pure integer — no " +
      "date-function or timezone representation can diverge.",
    Some("""
      WITH d AS (SELECT DISTINCT user_id,
                        epoch(date_trunc('day', ts))::BIGINT // 86400 AS day
                 FROM events),
           f AS (SELECT user_id, min(day) AS day0 FROM d GROUP BY user_id)
      SELECT (day0 * 86400)::BIGINT AS cohort_epoch,
             (day - day0)::BIGINT AS offset_days,
             count(*) AS n_users
      FROM d JOIN f ON f.user_id = d.user_id
      GROUP BY cohort_epoch, offset_days""".stripMargin),
    (spark, dir) => {
      val d = t(spark, dir, "events")
        .select(col("user_id"),
          expr("unix_timestamp(date_trunc('day', ts)) div 86400").as("day"))
        .distinct()
      val f = d.groupBy(col("user_id")).agg(min(col("day")).as("day0"))
      d.join(f, "user_id")
        .groupBy((col("day0") * 86400).cast("long").as("cohort_epoch"),
          (col("day") - col("day0")).cast("long").as("offset_days"))
        .agg(count(lit(1)).as("n_users"))
    })

  val gapfill = Q(
    "q_events_gapfill",
    "Time-series gap-fill / resample — the date-spine operator every " +
      "warehouse monitoring query needs (a naive hourly groupBy SILENTLY " +
      "omits empty hours, which downstream charts and anomaly detectors " +
      "misread as missing data rather than zero): generate the complete " +
      "hour × event_type spine between the observed min and max hour, " +
      "left-join the actual hourly counts, coalesce absent cells to " +
      "zero. The spine is GENERATED metadata-scale work (sequence × 5 " +
      "types — never a scan), the fact side joins by key; min/max ride " +
      "a 1-row broadcast cross (whitelisted, bounded).",
    Some("""
      WITH h AS (SELECT epoch(date_trunc('hour', ts))::BIGINT AS hr, event_type
                 FROM events),
           agg AS (SELECT hr, event_type, count(*) AS n
                   FROM h GROUP BY hr, event_type),
           rng AS (SELECT min(hr) AS mn, max(hr) AS mx FROM agg),
           et AS (SELECT DISTINCT event_type FROM agg),
           spine AS (SELECT t.h AS hr, et.event_type
                     FROM rng, unnest(range(mn, mx + 3600, 3600)) t(h), et)
      SELECT spine.hr AS hour_epoch, spine.event_type AS event_type,
             coalesce(n, 0)::BIGINT AS n_events
      FROM spine LEFT JOIN agg ON agg.hr = spine.hr
                              AND agg.event_type = spine.event_type""".stripMargin),
    (spark, dir) => {
      // ONE scan of the fact table: range and type set both derive from
      // the hourly aggregate, which is spine-bounded (|hours|·|types|
      // rows) — materialized so its three consumers reread the small
      // frame, not the corpus.
      val agg = Q.materialize(
        t(spark, dir, "events")
          .select(unix_timestamp(date_trunc("hour", col("ts"))).as("hr"),
            col("event_type"))
          .groupBy(col("hr"), col("event_type"))
          .agg(count(lit(1)).as("n")))
      val rng = agg.agg(min(col("hr")).as("mn"), max(col("hr")).as("mx"))
      val et = agg.select(col("event_type")).distinct()
      val spine = rng
        .select(explode(expr("sequence(mn, mx, 3600)")).as("hr"))
        .crossJoin(broadcast(et))
      spine.join(agg, Seq("hr", "event_type"), "left")
        .select(col("hr").as("hour_epoch"), col("event_type"),
          coalesce(col("n"), lit(0L)).cast("long").as("n_events"))
    })

  val scd2 = Q(
    "q_events_scd2",
    "SCD TYPE-2 HISTORY BUILD — the slowly-changing-dimension operator " +
      "every lakehouse dimension table is maintained with: from a " +
      "user's event stream, CHANGE DETECTION (an event opens a new " +
      "version iff its event_type differs from the previous event's) " +
      "followed by validity intervals — valid_from = the change event, " +
      "valid_to = the NEXT change (null while current). Three stages, " +
      "ONE user-keyed exchange reused by all of them: an ordered " +
      "window marks changes (lag), a running sum turns change flags " +
      "into version ordinals, a groupBy collapses each version's run " +
      "of events (first ts, event count), and a second window on the " +
      "same key chains valid_to = lead(valid_from). Timestamps ride " +
      "the repo's fractional-second double convention. Per-version " +
      "output: interval, ordinal, covered event count, is_current — " +
      "the exact frame a MERGE into a dimension table consumes.",
    Some("""
      WITH e AS (SELECT user_id, event_id, event_type, ts,
                        epoch(ts) AS tsd
                 FROM events),
           c AS (SELECT *,
                        CASE WHEN lag(event_type) OVER w IS NULL
                               OR lag(event_type) OVER w <> event_type
                             THEN 1 ELSE 0 END AS chg
                 FROM e
                 WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
           v AS (SELECT *,
                        sum(chg) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS ver
                 FROM c),
           g AS (SELECT user_id, ver::BIGINT AS version_n,
                        min(event_type) AS event_type,
                        min(tsd) AS valid_from,
                        count(*)::BIGINT AS n_events
                 FROM v GROUP BY user_id, ver)
      SELECT user_id, version_n, event_type, valid_from,
             lead(valid_from) OVER (PARTITION BY user_id
                                    ORDER BY version_n) AS valid_to,
             n_events,
             lead(valid_from) OVER (PARTITION BY user_id
                                    ORDER BY version_n) IS NULL AS is_current
      FROM g""".stripMargin),
    (spark, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wv = Window.partitionBy(col("user_id")).orderBy(col("version_n"))
      t(spark, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts"), col("ts").cast("double").as("tsd"))
        .withColumn("chg",
          when(lag(col("event_type"), 1).over(w).isNull
            || lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L)
            .otherwise(0L))
        .withColumn("version_n", sum(col("chg")).over(w))
        .groupBy(col("user_id"), col("version_n"))
        .agg(min(col("event_type")).as("event_type"),
          min(col("tsd")).as("valid_from"),
          count(lit(1)).cast("long").as("n_events"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(wv))
        .select(col("user_id"), col("version_n"), col("event_type"),
          col("valid_from"), col("valid_to"), col("n_events"),
          col("valid_to").isNull.as("is_current"))
    })

  val dwell = Q(
    "q_events_dwell",
    "DWELL-TIME census — the engagement metric product analytics " +
      "derives from raw event streams: per user, the gaps between " +
      "consecutive events (lag over the user-keyed ordered window, " +
      "fractional-second doubles), summarized as count/mean/max with " +
      "the share of gaps under a minute — the 'actively clicking vs " +
      "parked tab' split. The ordered window and the census groupBy " +
      "ride ONE user-keyed exchange (the SCD2/domain-cap reuse shape, " +
      "locked in PlanShapeSpec). Means round through the epsilon " +
      "convention; single-event users are excluded by the gap " +
      "non-null filter in BOTH engines.",
    Some("""
      WITH g AS (SELECT user_id,
                        epoch(ts) - lag(epoch(ts)) OVER (
                          PARTITION BY user_id
                          ORDER BY ts, event_id) AS gap_s
                 FROM events)
      SELECT user_id, count(*)::BIGINT AS n_gaps,
             round(avg(gap_s) + 1e-6, 2) AS mean_gap_s,
             round(max(gap_s) + 1e-6, 2) AS max_gap_s,
             sum(CASE WHEN gap_s < 60.0 THEN 1 ELSE 0 END)::BIGINT
               AS n_under_minute
      FROM g WHERE gap_s IS NOT NULL
      GROUP BY user_id""".stripMargin),
    (spark, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(spark, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          col("ts").cast("double").as("tsd"))
        .withColumn("gap_s", col("tsd") - lag(col("tsd"), 1).over(w))
        .filter(col("gap_s").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).cast("long").as("n_gaps"),
          r2e(avg(col("gap_s"))).as("mean_gap_s"),
          r2e(max(col("gap_s"))).as("max_gap_s"),
          sum(when(col("gap_s") < 60.0, 1L).otherwise(0L)).cast("long")
            .as("n_under_minute"))
    })

  val anomaly = Q(
    "q_events_anomaly",
    "VOLUME-ANOMALY census — the ops-monitoring primitive over the " +
      "hourly aggregate: each (hour, type) bucket's event count scored " +
      "as a z-score against ITS TYPE's mean/stddev over the whole " +
      "window, |z| >= 3 flagged. The per-type stats frame is bounded by " +
      "the type inventory (5 rows) and joins back BY TYPE — at any " +
      "scale the corpus aggregates once to hourly buckets (partial agg) " +
      "and the stats pass reads the BUCKETS, not the events. " +
      "Sample-stddev via the exact sum-of-squares identity spelled " +
      "identically in both engines over BIGINT counts; z rounds " +
      "through the 4-decimal epsilon convention. Output: only the " +
      "flagged buckets (the page a human reads), with their z and the " +
      "type baseline.",
    Some("""
      WITH h AS (SELECT epoch(date_trunc('hour', ts))::BIGINT AS hour_epoch,
                        event_type, count(*)::BIGINT AS n
                 FROM events GROUP BY hour_epoch, event_type),
           s AS (SELECT event_type, count(*)::BIGINT AS n_buckets,
                        sum(n)::BIGINT AS sum_n,
                        sum(n * n)::BIGINT AS sum_n2
                 FROM h GROUP BY event_type),
           z AS (SELECT h.hour_epoch, h.event_type, h.n,
                        (s.sum_n / (s.n_buckets::DOUBLE)) AS mean_n,
                        sqrt((s.sum_n2 - s.sum_n * s.sum_n / (s.n_buckets::DOUBLE))
                          / (s.n_buckets - 1)) AS sd_n
                 FROM h JOIN s ON s.event_type = h.event_type
                 WHERE s.n_buckets > 1)
      SELECT hour_epoch, event_type, n,
             round(mean_n + 1e-6, 2) AS mean_n2,
             round((n - mean_n) / sd_n + 1e-8, 4) AS z4
      FROM z
      WHERE sd_n > 0 AND abs((n - mean_n) / sd_n) >= 3.0""".stripMargin),
    (spark, dir) => {
      val h = t(spark, dir, "events")
        .groupBy(unix_timestamp(date_trunc("hour", col("ts")))
          .as("hour_epoch"), col("event_type"))
        .agg(count(lit(1)).cast("long").as("n"))
      val s = h.groupBy(col("event_type"))
        .agg(count(lit(1)).cast("long").as("n_buckets"),
          sum(col("n")).cast("long").as("sum_n"),
          sum(col("n") * col("n")).cast("long").as("sum_n2"))
        .filter(col("n_buckets") > 1)
      h.join(broadcast(s), "event_type")
        .withColumn("mean_n", col("sum_n") / col("n_buckets").cast("double"))
        .withColumn("sd_n",
          sqrt((col("sum_n2") - col("sum_n") * col("sum_n")
            / col("n_buckets").cast("double")) / (col("n_buckets") - 1)))
        .filter(col("sd_n") > 0
          && abs((col("n") - col("mean_n")) / col("sd_n")) >= 3.0)
        .select(col("hour_epoch"), col("event_type"), col("n"),
          round(col("mean_n") + lit(1e-6), 2).as("mean_n2"),
          round((col("n") - col("mean_n")) / col("sd_n") + lit(1e-8), 4)
            .as("z4"))
    })

  val markov = Q(
    "q_events_markov",
    "BEHAVIORAL TRANSITION MATRIX — the first-order Markov model of " +
      "user actions (the churn/intent-model primitive): per user, " +
      "consecutive event-type pairs from the lag window, aggregated " +
      "into the global (from, to) transition counts and row-normalized " +
      "into probabilities. Transition probabilities are EXACT integer " +
      "ratios of BIGINT counts (single division — IEEE-identical, no " +
      "rounding law needed); the per-from totals come from a second " +
      "aggregation over the PAIR frame (25 rows max — never the " +
      "events) joined back by the from key. One user-keyed exchange " +
      "for the lag, one pair-keyed aggregation; MarkovSpec pins the " +
      "stochastic-matrix law (each row sums to exactly 1).",
    Some("""
      WITH p AS (SELECT lag(event_type) OVER (
                          PARTITION BY user_id
                          ORDER BY ts, event_id) AS from_type,
                        event_type AS to_type
                 FROM events),
           c AS (SELECT from_type, to_type, count(*)::BIGINT AS n
                 FROM p WHERE from_type IS NOT NULL
                 GROUP BY from_type, to_type),
           tot AS (SELECT from_type, sum(n)::BIGINT AS n_from
                   FROM c GROUP BY from_type)
      SELECT c.from_type, c.to_type, c.n, t.n_from,
             c.n / (t.n_from::DOUBLE) AS prob
      FROM c JOIN tot t ON t.from_type = c.from_type""".stripMargin),
    (spark, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val c = t(spark, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type").as("to_type"))
        .withColumn("from_type", lag(col("to_type"), 1).over(w))
        .filter(col("from_type").isNotNull)
        .groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).cast("long").as("n"))
      val tot = c.groupBy(col("from_type"))
        .agg(sum(col("n")).cast("long").as("n_from"))
      c.join(tot, "from_type")
        .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
          (col("n") / col("n_from").cast("double")).as("prob"))
    })

  val all: Seq[Q] = Seq(hourly, sessions, json, setops, funnel, intervalJoin,
    retentionCohorts, gapfill, scd2, dwell, anomaly, markov)
}
