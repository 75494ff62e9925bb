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

  /** Open-session accumulator; start/lastTs are epoch MICROS, matching the
    * batch mirror's fractional-second double compares at full parquet
    * precision (public: encoder codegen needs access).
    */
  case class SessionState(start: Long, lastTs: Long, n: Long, total: Double)

  /** Epoch micros of a Timestamp (getTime alone truncates to millis). */
  def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  /** Timestamp from epoch micros — the inverse of [[micros]]. A plain
    * `new Timestamp(us / 1000)` would truncate to millis, losing the
    * sub-millisecond precision the session state deliberately keeps.
    */
  def tsOfMicros(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000L * 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  /** One gap-merged session interval in the [[sessionize]] fold. */
  private case class Sess(start: Long, last: Long, n: Long, total: Double)

  /** Watermarked tumbling-hour aggregation — the incremental form of
    * `q_events_hourly` (same grouping keys, aggregates AND rounding: the
    * epsilon-shifted round keeps incremental state-store accumulation
    * comparable to the batch partial-agg despite summation-order noise).
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.queries.Det.r2e(sum(col("value"))).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("hour_epoch"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Gap-based sessionizer (30-min inactivity), the incremental form of
    * `q_events_sessions`: per-user state carries the open session; events
    * past the gap close it and emit, and an EVENT-TIME timeout (watermark
    * passing lastTs + 2×gap) flushes stragglers and evicts their state —
    * state size is bounded by ACTIVE users, not all users ever seen, and
    * eviction is deterministic in event time (no wall-clock dependence).
    * Emits one row per closed session plus the open-session snapshot per
    * batch.
    *
    * Late arrivals within the watermark fold into the open session by
    * TIME ORDER (interval merge), exactly as the batch mirror's global
    * sort would place them — including moving the session start earlier.
    * The one append-mode divergence from batch: a straggler older than
    * the open session by more than the gap emits as its own closed
    * session immediately; it cannot retro-merge into a session that
    * already closed before it arrived (closed emissions are final).
    * This immediate close happens even when the watermark has NOT yet
    * passed that straggler session's end+gap — so two stragglers of the
    * same logical earlier session split across micro-batches emit as TWO
    * closed sessions where the batch mirror yields one. Holding
    * non-newest sessions in state until the watermark passes last+gap
    * would close that gap at the cost of multi-session state per user;
    * append-mode finality is the documented, spec-pinned trade here.
    */
  def sessionize(spark: SparkSession, events: Dataset[Event],
      gapSeconds: Long = 1800,
      watermarkDelay: String = "10 minutes"): Dataset[SessionUpdate] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // Idle past the timeout: close the open session, evict state.
            val out = state.getOption.toSeq.map(s =>
              SessionUpdate(user, Streams.tsOfMicros(s.start), s.n, s.total,
                closed = true))
            state.remove()
            out.iterator
          } else {
            // ONE time-ordered interval fold over the open-session state
            // and this batch's events. A late arrival within the watermark
            // may precede the state's lastTs (a naive lastTs := t would
            // REGRESS the session clock and falsely split on the next
            // event) or even precede its start by more than the gap (this
            // user's events can run ahead of the GLOBAL watermark, so a
            // straggler may belong to an earlier, separate session). The
            // batch mirror sorts all events by ts before gap-splitting;
            // merging intervals in start order with gap tolerance computes
            // exactly that fixpoint: every maximal run whose neighbor gaps
            // are <= gap is one session — all but the newest close now,
            // the newest becomes the state.
            val gapUs = gapSeconds * 1000000L
            val evs = it.toSeq
              .sortBy(e => (Streams.micros(e.ts), e.event_id))
              .map(e => { val t = Streams.micros(e.ts); Sess(t, t, 1, e.value) })
            val prior = state.getOption
              .map(s => Sess(s.start, s.lastTs, s.n, s.total)).toSeq
            val sessions = (prior ++ evs).sortBy(s => (s.start, s.last))
              .foldLeft(List.empty[Sess]) {
                case (h :: tl, s) if s.start - h.last <= gapUs =>
                  Sess(h.start, math.max(h.last, s.last),
                    h.n + s.n, h.total + s.total) :: tl
                case (acc, s) => s :: acc
              }.reverse
            if (sessions.isEmpty) Iterator.empty
            else {
              val out = Seq.newBuilder[SessionUpdate]
              sessions.init.foreach(s => out += SessionUpdate(user,
                Streams.tsOfMicros(s.start), s.n, s.total, closed = true))
              val open = sessions.last
              state.update(SessionState(open.start, open.last, open.n, open.total))
              // Evict when the watermark passes 2×gap beyond the last event
              // (millis API; must stay above the current watermark or Spark
              // rejects it).
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs() + 1000,
                open.last / 1000 + gapSeconds * 2 * 1000))
              out += SessionUpdate(user, Streams.tsOfMicros(open.start),
                open.n, open.total, closed = false)
              out.result().iterator
            }
          }
      }
  }

  /** A click joined to the purchase it converted into. */
  case class Conversion(user_id: Long, click_id: Long, purchase_id: Long,
      click_epoch: Long, purchase_epoch: Long, value: Double)

  /** Stream-stream interval join — conversion attribution: every click
    * joined to the same user's purchases arriving within `windowSeconds`
    * AFTER it. Both sides are watermarked and the join condition carries
    * the time-range bound, so Spark can size the join state from the
    * watermark delay + interval and evict rows deterministically in event
    * time — the state-bounding contract of production stream-stream joins
    * (an unbounded-condition stream join would accumulate state forever).
    * Equi key (user_id) + range predicate: shuffles both sides once by
    * user, never a product. StreamsSpec asserts equality with the same
    * join run as a batch query on the same data.
    */
  def attributedConversions(events: Dataset[Event],
      windowSeconds: Long = 1800,
      watermarkDelay: String = "1 hour"): DataFrame =
    conversionJoin(events, windowSeconds, watermarkDelay, "inner")

  /** Left-outer form of [[attributedConversions]] — the abandoned-click
    * analysis: every click, with the converting purchase's columns when
    * one arrived inside the window and NULLs when none did. The NULL rows
    * of a streaming left-outer interval join emit only once the watermark
    * passes the click's join-state bound (click_ts + window + delay) —
    * the deterministic event-time point where "no purchase" stops being
    * "not yet" and becomes a fact. Same state-bounding contract and
    * equi-key shuffle as the inner join; StreamsSpec asserts stream ==
    * batch left join including the NULL rows.
    */
  def attributedConversionsOuter(events: Dataset[Event],
      windowSeconds: Long = 1800,
      watermarkDelay: String = "1 hour"): DataFrame =
    conversionJoin(events, windowSeconds, watermarkDelay, "left_outer")

  private def conversionJoin(events: Dataset[Event], windowSeconds: Long,
      watermarkDelay: String, joinType: String): DataFrame = {
    val clicks = events.toDF()
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermarkDelay)
    val purchases = events.toDF()
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
        col("value"))
      .withWatermark("purchase_ts", watermarkDelay)
    clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"interval $windowSeconds seconds"),
      joinType)
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        unix_timestamp(col("click_ts")).as("click_epoch"),
        unix_timestamp(col("purchase_ts")).as("purchase_epoch"),
        col("value"))
  }

  case class DocEvent(doc_id: Long, ts: Timestamp, text: String)

  /** Streaming corpus-clean funnel — the incremental face of
    * `pipeline_corpus_clean`'s stage sequence over a document stream with
    * (doc_id, ts, text, lang, source) columns: watermarked exact dedup on
    * the md5 fingerprint (`dropDuplicatesWithinWatermark` keeps the FIRST
    * arrival per fingerprint — the streaming analog of the batch min-doc_id
    * canonical — and, unlike plain `dropDuplicates` on a non-event-time
    * key, actually EVICTS each fingerprint's state once the watermark
    * passes its expiry, so state is bounded by fingerprints active in the
    * watermark window), then the IDENTICAL quality and
    * language-consistency column expressions the batch funnel uses
    * (stateless, whole-stage codegen), then the per-(source, lang) running
    * census in update mode. One stateful operator + one aggregation —
    * the same two-exchange budget as the batch plan, incrementalized.
    */
  def corpusCleanStream(docs: DataFrame,
      watermarkDelay: String = "1 hour"): DataFrame = {
    import graft.queries.TextOps
    val toks = filter(split(col("text"), " "), x => x =!= "")
    val fped = docs
      .withWatermark("ts", watermarkDelay)
      .withColumn("fp", md5(col("text")))
    // Streaming-only operator; on a batch frame (StreamsSpec's parity
    // truth) plain dropDuplicates IS the within-watermark semantics.
    val deduped =
      if (fped.isStreaming) fped.dropDuplicatesWithinWatermark("fp")
      else fped.dropDuplicates("fp")
    deduped
      .select(Seq(col("source"), col("lang"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct")) ++
        TextOps.langScoreCols: _*)
      .withColumn("quality", TextOps.qualityCol)
      .withColumn("lang_pred", TextOps.langPredCol)
      .filter(col("quality") >= 0.35 && col("lang_pred") === col("lang"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("total_tokens"))
  }

  /** A streaming candidate pair that survived exact shingle-Jaccard
    * verification — the incremental form of a `dedup_lsh_verified` row.
    */
  case class VerifiedDupPair(doc_id: Long, prior_doc_id: Long,
      n_common: Long, jaccard: Double)

  /** An arriving doc that landed in a band bucket already containing
    * `prior_doc_id` — a near-dup candidate pair, emitted once per
    * (pair, band) when the later doc arrives.
    */
  case class DupCandidate(band: Int, doc_id: Long, prior_doc_id: Long)

  /** Streaming MinHash-LSH dedup candidates: each arriving doc's band keys
    * come from the SAME stateless signature projection the batch path uses
    * (`Dedup.shingleArrayOfToks` + per-seed `array_min` folds, md5 over
    * each band's r-tuple of minhashes — `Dedup.bandKey`, so stream and
    * batch bucket identically; no shuffle before the keyed state); one
    * GroupState cell per (band, key) bucket holds ALL member doc_ids seen
    * so far (capped at `Lsh.MaxBucket`), and each arrival emits a candidate
    * against every prior member — the same in-bucket all-pairs contract as
    * the batch `candidatePairsFrom`, so a true pair is emitted whenever ANY
    * band agrees, regardless of which unrelated doc reached the bucket
    * first. Candidates then feed the same exact-verify stage as the batch
    * pipeline ([[verifiedDupPairs]]). Cap semantics diverge from batch by
    * necessity: batch drops an over-cap bucket retroactively; a stream
    * cannot retract, so a bucket at the cap stops admitting members and
    * emits nothing further (state stays bounded at MaxBucket longs per
    * occupied bucket). Buckets idle past `bucketTtlSeconds` of EVENT time
    * are evicted by the same watermark-driven timeout as [[sessionize]] —
    * total state is bounded by buckets ACTIVE within the TTL window, at
    * the documented recall cost that a dup arriving after its bucket
    * expired re-seeds it instead of pairing.
    *
    * Membership state is kept as a sorted primitive array with
    * binary-search lookups: a bucket near the cap pays O(log n) boxed-free
    * comparisons per arrival instead of the O(n) `Seq.contains` of the
    * round-2 version (the insert's arraycopy is a memcpy bounded by the
    * cap, and GroupState re-encodes the whole value per update anyway).
    */
  def lshDedupCandidates(spark: SparkSession, docs: Dataset[DocEvent],
      bucketTtlSeconds: Long = 3600,
      watermarkDelay: String = "1 hour"): Dataset[DupCandidate] = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.queries.{Dedup, Lsh}
    // The per-shingle lane arrays (one native Md5Lanes call per shingle)
    // are materialized as an attribute before the 16 lane-minima reference
    // them (CollapseProject would otherwise re-evaluate the hashing
    // transform per referencing lane).
    val mins = (0 until Dedup.numHashes).map(i =>
      array_min(transform(col("lanesArr"), a => a.getItem(i))))
    val bandStructs = (0 until Dedup.bands).map(b =>
      struct(lit(b).as("band"), Dedup.bandKey(b, mins).as("key")))
    docs.toDF()
      .withWatermark("ts", watermarkDelay)
      .select(col("doc_id"), col("ts"), Dedup.toksOf(col("text")).as("tk"))
      .select(col("doc_id"), col("ts"),
        Dedup.shingleArrayOfToks(col("tk")).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), col("ts"),
        transform(col("sh"),
          x => graft.functions.Md5Lanes(x, 0, Dedup.numSeeds)).as("lanesArr"))
      .select(col("doc_id"), col("ts"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"),
        col("doc_id"), col("ts"))
      .as[(Int, String, Long, Timestamp)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[Array[Long], DupCandidate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout()) {
        (bk: (Int, String), it: Iterator[(Int, String, Long, Timestamp)],
            state: GroupState[Array[Long]]) =>
          if (state.hasTimedOut) {
            // Bucket idle past the TTL: forget it (bounded state).
            state.remove()
            Iterator.empty
          } else {
            val rows = it.toSeq
            var members = state.getOption.getOrElse(Array.empty[Long])
            val out = Seq.newBuilder[DupCandidate]
            rows.map(_._3).sorted.foreach { d =>
              val at = java.util.Arrays.binarySearch(members, d)
              if (members.length < Lsh.MaxBucket && at < 0) {
                members.foreach(prior => out += DupCandidate(bk._1, d, prior))
                val ins = -(at + 1)
                val next = new Array[Long](members.length + 1)
                System.arraycopy(members, 0, next, 0, ins)
                next(ins) = d
                System.arraycopy(members, ins, next, ins + 1,
                  members.length - ins)
                members = next
              }
            }
            state.update(members)
            val maxTsMs = rows.map(r => micros(r._4) / 1000L).max
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1000,
              maxTsMs + bucketTtlSeconds * 1000))
            out.result().iterator
          }
      }
  }

  /** Streaming fixed-range histogram sketch — the incremental face of
    * `q_quantile_sketch`'s build stage: per-bucket counts over a FIXED
    * [mn, mx) range (a stream cannot two-pass for min/max; production
    * streaming histograms pin the range a priori and clamp outliers into
    * the edge buckets — the clamp is the honest divergence from the
    * batch sketch, which derives its range from the data). The state is
    * the sketch itself: at most `buckets` rows regardless of stream
    * volume, updated by a partial-aggregable count — the property that
    * makes sketch maintenance FREE under retries and repartitioning.
    * Quantile readout happens sink-side over the ≤`buckets`-row table,
    * exactly as the batch query's cumulative walk.
    */
  def histogramStream(values: DataFrame, mn: Double, mx: Double,
      buckets: Int = 1024, watermarkDelay: String = "1 hour"): DataFrame =
    values
      .withWatermark("ts", watermarkDelay)
      .groupBy(greatest(least(
        floor((col("value") - lit(mn)) / lit((mx - mn) / buckets)),
        lit(buckets - 1).cast("long")), lit(0L)).as("bucket"))
      .agg(count(lit(1)).as("c"))

  /** A versioned document revision flowing through [[upsertStream]]. */
  case class DocVersion(doc_id: Long, version: Long, ts: Timestamp,
      text: String)

  /** Streaming latest-version-wins MERGE — the incremental face of
    * `pipeline_upsert` (how a CDC feed maintains a live corpus store):
    * one GroupState cell per doc holds the highest version seen, and a
    * state change emits the new current row (doc_id, version, fp) for
    * the sink to upsert. Out-of-order and duplicate revisions are
    * absorbed by the max-version guard — replayed micro-batches emit the
    * same current row again, which the idempotent sink upsert absorbs
    * (the standard exactly-once contract). State is one (version, fp)
    * pair per live doc, evicted by the event-time TTL once a doc has
    * been idle past `docTtlSeconds` — at which point its current version
    * lives only in the store, the correct division of labor.
    *
    * SINK CONTRACT (the eviction consequence, stated honestly): after a
    * doc's state is evicted, a late revision re-seeds EMPTY state and is
    * emitted as the doc's current row even if its version is LOWER than
    * the one already committed downstream (flatMapGroupsWithState does
    * not drop late rows). The sink must therefore upsert CONDITIONALLY —
    * apply an incoming row only when `incoming.version >= stored.version`
    * (the max_by(version) rule `pipeline_upsert` runs in batch; e.g. a
    * [[graft.sources.Snapshots.merge]] of the pre-max'd batch). A sink
    * that upserts on doc_id alone can regress a stored version.
    */
  def upsertStream(spark: SparkSession, docs: Dataset[DocVersion],
      docTtlSeconds: Long = 3600,
      watermarkDelay: String = "1 hour"): DataFrame = {
    import spark.implicits._
    docs.toDF()
      .withWatermark("ts", watermarkDelay)
      .select(col("doc_id"), col("version"), col("ts"),
        md5(col("text")).as("fp"))
      .as[(Long, Long, Timestamp, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, String), (Long, Long, String)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout()) {
        (doc: Long, it: Iterator[(Long, Long, Timestamp, String)],
            state: GroupState[(Long, String)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val rows = it.toSeq
            // Tie-break equal versions by fp — lexicographic (version, fp)
            // BOTH within the batch and against the state, so the final
            // emitted row for a doc is the same no matter how its
            // revisions split or reorder across micro-batches (an
            // equal-version revision in a later batch must win or lose by
            // the same rule it would have in the same batch; comparing
            // version alone would make the winner arrival-order-dependent,
            // breaking the idempotent-sink contract across replays).
            val best = rows.maxBy(r => (r._2, r._4))
            val out = state.getOption match {
              case Some((v, f))
                  if Ordering[(Long, String)].gteq((v, f), (best._2, best._4)) =>
                Iterator.empty
              case _ =>
                state.update((best._2, best._4))
                Iterator.single((doc, best._2, best._4))
            }
            val maxTsMs = rows.map(r => micros(r._3) / 1000L).max
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1000,
              maxTsMs + docTtlSeconds * 1000))
            out
          }
      }
      .toDF("doc_id", "version", "fp")
  }

  /** An arriving doc that contains a CDC chunk already owned by an earlier
    * document — one row per (doc, chunk) duplication observed.
    */
  case class ChunkDup(doc_id: Long, chunk_fp: String, owner_doc_id: Long)

  /** Streaming chunk-level dedup over content-defined boundaries — the
    * incremental face of `dedup_cdc`: each arriving doc is reduced to its
    * DISTINCT CDC chunk fingerprints by the SAME stateless projection the
    * batch path uses (`CorpusOps.cdcFpArray`, window=8/maskBits=5 locked
    * to ta_cdc_chunks), then one GroupState cell per fingerprint records
    * the chunk's OWNER (the first doc that carried it), and every later
    * doc carrying the same chunk emits a [[ChunkDup]] against that owner.
    * CDC is what makes this work under edits: an insertion re-synchronizes
    * chunk boundaries, so an edited near-dup still collides on most of its
    * chunks (fixed-stride chunking would miss everything past the edit).
    *
    * Semantics vs batch, stated honestly: `dedup_cdc` marks EVERY doc of a
    * ≥2-doc chunk cohort as shared (retroactive census); a stream cannot
    * retract, so the owner itself is never flagged — arrivals after it
    * are. Within a micro-batch, ownership is deterministic (doc_id order);
    * across batches it is arrival order — StreamsSpec pins both. State is
    * one long per live fingerprint, evicted by the same watermark-driven
    * event-time TTL as the LSH buckets ([[lshDedupCandidates]]): chunks
    * idle past `chunkTtlSeconds` are forgotten, bounding state by
    * fingerprints ACTIVE in the TTL window at the documented cost that a
    * dup arriving later re-seeds ownership instead of pairing.
    */
  def cdcDedupStream(spark: SparkSession, docs: Dataset[DocEvent],
      chunkTtlSeconds: Long = 3600,
      watermarkDelay: String = "1 hour"): Dataset[ChunkDup] = {
    import spark.implicits._
    graft.queries.CorpusOps
      .cdcFpArray(docs.toDF().withWatermark("ts", watermarkDelay),
        "doc_id", "ts")
      .select(col("doc_id"), col("ts"), explode(col("chunk_fps")).as("chunk_fp"))
      .as[(Long, Timestamp, String)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[Long, ChunkDup](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout()) {
        (fp: String, it: Iterator[(Long, Timestamp, String)],
            state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val rows = it.toSeq
            val out = Seq.newBuilder[ChunkDup]
            var owner = state.getOption
            rows.map(_._1).sorted.foreach { d =>
              owner match {
                case Some(o) => if (d != o) out += ChunkDup(d, fp, o)
                case None => owner = Some(d)
              }
            }
            owner.foreach(state.update)
            val maxTsMs = rows.map(r => micros(r._2) / 1000L).max
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1000,
              maxTsMs + chunkTtlSeconds * 1000))
            out.result().iterator
          }
      }
  }

  /** An arriving image whose perceptual hash an earlier image already
    * owns — one row per visual-dup candidate observed.
    */
  case class PhashDup(doc_id: Long, phash: Long, owner_doc_id: Long)

  /** Streaming image near-dup candidates — the incremental face of
    * `mm_phash`: each arriving payload goes through the SAME real decode +
    * blockhash as the batch path (`Bmp.phash16` over the synthesized BMP,
    * partition-local — payload bytes never shuffle; only (doc, ts, hash)
    * rows reach the keyed state), one GroupState cell per hash records the
    * OWNER (first image seen with it), and every later image colliding on
    * the hash emits a [[PhashDup]] against that owner — the candidate
    * stream an image-dedup verify stage consumes, exactly
    * [[cdcDedupStream]]'s ownership contract keyed by the visual
    * fingerprint instead of a content chunk.
    *
    * Same honest divergence from the batch census as CDC dedup: `mm_phash`
    * marks EVERY member of a collision cohort (n_same ≥ 2) retroactively;
    * a stream cannot retract, so the owner itself is never flagged.
    * Within a micro-batch ownership is deterministic (doc_id order);
    * across batches it is arrival order. State is one long per live hash
    * (bounded at 2^bits cells even before the TTL), evicted by the same
    * watermark-driven event-time timeout as the LSH buckets.
    */
  def phashDedupStream(spark: SparkSession, docs: Dataset[DocEvent],
      hashTtlSeconds: Long = 3600,
      watermarkDelay: String = "1 hour"): Dataset[PhashDup] = {
    import spark.implicits._
    docs.toDF()
      .filter(length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      .select(col("doc_id"), col("ts"), col("text"))
      .as[(Long, Timestamp, String)]
      .mapPartitions(_.map { case (id, ts, text) =>
        (id, ts, graft.multimodal.Bmp.phash16(
          graft.multimodal.Multimodal.syntheticBmp(
            text.getBytes(java.nio.charset.StandardCharsets.UTF_8))).toLong)
      })
      .toDF("doc_id", "ts", "phash")
      // The watermark goes on AFTER the typed map: a map's output columns
      // are new attributes, so a tag set before it would not survive to
      // the stateful operator (EventTimeTimeout requires it downstream).
      .withWatermark("ts", watermarkDelay)
      .as[(Long, Timestamp, Long)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[Long, PhashDup](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout()) {
        (hash: Long, it: Iterator[(Long, Timestamp, Long)],
            state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val rows = it.toSeq
            val out = Seq.newBuilder[PhashDup]
            var owner = state.getOption
            rows.map(_._1).sorted.foreach { d =>
              owner match {
                case Some(o) => if (d != o) out += PhashDup(d, hash, o)
                case None => owner = Some(d)
              }
            }
            owner.foreach(state.update)
            val maxTsMs = rows.map(r => micros(r._2) / 1000L).max
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1000,
              maxTsMs + hashTtlSeconds * 1000))
            out.result().iterator
          }
      }
  }

  /** A frame-level visual dup: this (doc, frame) hashed identically to an
    * earlier-seen owner frame (possibly another frame of the same video —
    * stills repeat within one stream too, and the batch census counts
    * them the same way).
    */
  case class VideoFrameDup(doc_id: Long, frame_idx: Long, fhash: Long,
      owner_doc_id: Long, owner_frame_idx: Long)

  /** Streaming VIDEO near-dup — the live face of `mm_video_phash`, and
    * the frame-granular sibling of [[phashDedupStream]]: each arriving
    * payload is decoded through the idx1 INDEX-SEEK path
    * ([[graft.multimodal.Avi.decodeIndexed]], step 2 — identical hashes
    * to the batch query by AviSpec's parity pin), every sampled frame's
    * 16-bit blockhash becomes a key, and per hash the first-seen
    * (doc, frame) owns the bucket; later frames with the same hash emit
    * [[VideoFrameDup]] rows. State per hash is ONE (owner_doc,
    * owner_frame) pair, bounded by the 2^bits hash space regardless of
    * ingest volume, and event-time TTL'd ([[phashDedupStream]]'s
    * eviction contract verbatim). Payload bytes never enter state — only
    * fixed-width key/owner rows.
    */
  def videoPhashDedupStream(spark: SparkSession, docs: Dataset[DocEvent],
      hashTtlSeconds: Long = 3600,
      watermarkDelay: String = "1 hour"): Dataset[VideoFrameDup] = {
    import spark.implicits._
    docs.toDF()
      .filter(length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      .select(col("doc_id"), col("ts"), col("text"))
      .as[(Long, Timestamp, String)]
      .mapPartitions(_.flatMap { case (id, ts, text) =>
        graft.multimodal.Avi.decodeIndexed(
          graft.multimodal.Multimodal.syntheticAvi(
            text.getBytes(java.nio.charset.StandardCharsets.UTF_8)), 2)
          .frames.map(f => (id, ts, f.frameIdx.toLong, f.phash16))
      })
      .toDF("doc_id", "ts", "frame_idx", "fhash")
      // Watermark AFTER the typed map, as in phashDedupStream: the map's
      // output columns are new attributes.
      .withWatermark("ts", watermarkDelay)
      .as[(Long, Timestamp, Long, Long)]
      .groupByKey(_._4)
      .flatMapGroupsWithState[(Long, Long), VideoFrameDup](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout()) {
        (hash: Long, it: Iterator[(Long, Timestamp, Long, Long)],
            state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val rows = it.toSeq
            val out = Seq.newBuilder[VideoFrameDup]
            var owner = state.getOption
            rows.map(r => (r._1, r._3)).sorted.foreach { df =>
              owner match {
                case Some(o) => if (df != o)
                  out += VideoFrameDup(df._1, df._2, hash, o._1, o._2)
                case None => owner = Some(df)
              }
            }
            owner.foreach(state.update)
            val maxTsMs = rows.map(r => micros(r._2) / 1000L).max
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1000,
              maxTsMs + hashTtlSeconds * 1000))
            out.result().iterator
          }
      }
  }

  /** The full streaming dedup pipeline: [[lshDedupCandidates]] composed
    * with the SAME exact shingle-Jaccard verification the batch
    * `dedup_lsh_verified` query applies — candidates are joined (stateless
    * stream-static equi joins) against a doc store carrying each document's
    * distinct shingle set, the exact intersection/union ratio is computed
    * per candidate pair, and only pairs at `jaccardMin` or above are
    * emitted. Verification cost is O(candidates) — the LSH contract — and
    * the Jaccard math is the identical exact integer ratio as batch
    * (`|A∩B| / (|A|+|B|−|A∩B|)` over distinct shingle sets), so
    * StreamsSpec can assert stream == batch pair-for-pair.
    *
    * Delivery is at-least-once per pair: a pair whose signatures agree on
    * k bands is verified and emitted up to k times (bounded by b=4). A
    * cross-band streaming distinct would need a second stateful operator
    * chained after flatMapGroupsWithState (unsupported combination) — the
    * standard contract applies instead: the sink upserts on the pair key,
    * which is also how exactly-once is achieved for re-delivered
    * micro-batches generally.
    *
    * `docStore` is the static (doc_id, text) corpus the arrivals are being
    * checked against (at scale: the deduped store the pipeline maintains,
    * refreshed per deployment's compaction cadence — stream-static join
    * re-reads it per micro-batch).
    */
  def verifiedDupPairs(spark: SparkSession, docs: Dataset[DocEvent],
      docStore: DataFrame, jaccardMin: Double = 0.5,
      bucketTtlSeconds: Long = 3600,
      watermarkDelay: String = "1 hour"): Dataset[VerifiedDupPair] = {
    import spark.implicits._
    import graft.queries.{Dedup, Q}
    // Materialized ONCE: the store is static, but a stream-static join
    // re-evaluates the static plan on EVERY micro-batch — and it appears
    // on both join sides, so without this the full tokenize+shingle
    // explosion would run twice per batch forever.
    val store = Q.materialize(docStore
      .select(col("doc_id"), Dedup.toksOf(col("text")).as("tk"))
      .select(col("doc_id"), Dedup.shingleArrayOfToks(col("tk")).as("sh")))
    val inter = size(array_intersect(col("a_sh"), col("b_sh")))
    lshDedupCandidates(spark, docs, bucketTtlSeconds, watermarkDelay)
      .join(store.select(col("doc_id").as("a_id"), col("sh").as("a_sh")),
        col("doc_id") === col("a_id"))
      .join(store.select(col("doc_id").as("b_id"), col("sh").as("b_sh")),
        col("prior_doc_id") === col("b_id"))
      .withColumn("n_common", inter.cast("long"))
      .withColumn("jaccard", col("n_common") /
        (size(col("a_sh")) + size(col("b_sh")) - col("n_common")))
      .filter(col("jaccard") >= jaccardMin)
      .select(col("doc_id"), col("prior_doc_id"), col("n_common"),
        col("jaccard"))
      .as[VerifiedDupPair]
  }

  /** One WebDataset shard entry observed by a streaming shard scanner:
    * sample stem, part suffix ("txt"/"json"), observation time, size.
    */
  case class ShardEntry(sample_key: String, part: String, ts: Timestamp,
      n_bytes: Long)

  /** An assembled (or abandoned) sample: `complete` marks whether both
    * required parts arrived before the orphan TTL; incomplete rows carry
    * the missing part list and -1 for absent sizes — the DLQ face.
    */
  case class AssembledSample(sample_key: String, complete: Boolean,
      n_parts: Long, txt_bytes: Long, meta_bytes: Long, missing: String)

  /** Streaming SAMPLE ASSEMBLY — the stateful face of
    * `src_webdataset_ingest`: parallel shard scanners emit tar entries as
    * they walk, so a sample's `.txt` and `.json` arrive in ANY order,
    * possibly in different micro-batches (and retransmits duplicate
    * them). One GroupState cell per sample stem accumulates the parts
    * seen (first occurrence of a part wins — re-deliveries are ignored,
    * so the emitted row is ARRIVAL-ORDER INDEPENDENT); the moment both
    * required parts are present the assembled sample emits and the state
    * drops. Orphans (a part never arrives) are evicted by the
    * watermark-driven event-time TTL as an explicit `complete=false` row
    * naming the missing part — the quarantine lane, never a silent drop.
    * State is one small map per LIVE (incomplete) sample only — completed
    * stems free their state immediately, so state size tracks the
    * in-flight frontier, not the corpus. Idempotent-sink contract as
    * upsertStream: a full re-delivery of an already-completed sample
    * would re-assemble it, and the sink keyed by sample_key absorbs it.
    */
  def sampleAssemblyStream(spark: SparkSession, entries: Dataset[ShardEntry],
      orphanTtlSeconds: Long = 3600,
      watermarkDelay: String = "1 hour"): Dataset[AssembledSample] = {
    import spark.implicits._
    val required = Seq("txt", "json")
    entries.toDF()
      .withWatermark("ts", watermarkDelay)
      .as[ShardEntry]
      .groupByKey(_.sample_key)
      .flatMapGroupsWithState[Map[String, Long], AssembledSample](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout()) {
        (key: String, it: Iterator[ShardEntry],
            state: GroupState[Map[String, Long]]) =>
          if (state.hasTimedOut) {
            val parts = state.getOption.getOrElse(Map.empty[String, Long])
            state.remove()
            Iterator.single(AssembledSample(key, complete = false,
              parts.size.toLong, parts.getOrElse("txt", -1L),
              parts.getOrElse("json", -1L),
              required.filterNot(parts.contains).mkString(",")))
          } else {
            var parts = state.getOption.getOrElse(Map.empty[String, Long])
            val rows = it.toSeq
            // Deterministic within a batch regardless of iterator order:
            // the part sizes are a function of the part, and first-wins
            // over an already-seen part changes nothing.
            rows.foreach { e =>
              if (!parts.contains(e.part)) parts += e.part -> e.n_bytes
            }
            if (required.forall(parts.contains)) {
              state.remove()
              Iterator.single(AssembledSample(key, complete = true,
                parts.size.toLong, parts("txt"), parts("json"), ""))
            } else {
              state.update(parts)
              val maxTsMs = rows.map(r => micros(r.ts) / 1000L).max
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs() + 1000,
                maxTsMs + orphanTtlSeconds * 1000))
              Iterator.empty
            }
          }
      }
  }

  /** One doc arriving for the streaming stratified sampler. */
  case class StratumDoc(doc_id: Long, ts: Timestamp, source: String)

  /** An admission to a stratum's current bottom-k sample: `doc_id` entered
    * `source`'s k smallest (h, doc_id) set at arrival time.
    */
  case class SampleAdmit(source: String, doc_id: Long, h: String)

  /** Streaming exact-k stratified sampling — the incremental face of
    * `pipeline_sample_exact_k`, built on the bottom-k-by-hash sketch (the
    * KMV construction): rank every doc by the SAME deterministic
    * permutation as the batch query (md5 of "9:"+doc_id, doc_id
    * tie-break) and keep, per source stratum, the k smallest. Bottom-k
    * over a uniform hash is a MERGEABLE, arrival-order-invariant
    * summary, which is the whole trick: the final sample equals the batch
    * query's no matter how arrivals split, reorder, or duplicate across
    * micro-batches.
    *
    * Emission contract (a stream cannot retract an Append row): each
    * ADMISSION is emitted — a doc whose rank enters its stratum's current
    * bottom-k. Any doc in the final sample was necessarily admitted on
    * arrival (its rank is among the k smallest overall, hence among the k
    * smallest so-far), so the consumer recovers the exact final sample by
    * re-taking bottom-k per source over the admission log — expected
    * O(k·ln n) admissions per stratum, the harmonic bound on running
    * minima, so the log stays tiny. StreamsSpec pins parity against the
    * batch query under split AND permuted arrivals, plus duplicate
    * idempotence.
    *
    * State: exactly ≤ k (hash, id) pairs per stratum — bounded by
    * k·|sources| with no watermark dependence, so NoTimeout is correct
    * (an event-time TTL would silently drop strata from the sample;
    * sampling state must outlive quiet periods). At 100 TB the stream
    * shuffles only (source, id, hash) rows, one keyed exchange.
    */
  def bottomKSampleStream(spark: SparkSession, docs: Dataset[StratumDoc],
      k: Int = 5): Dataset[SampleAdmit] = {
    import spark.implicits._
    docs.toDF()
      .select(col("source"), col("doc_id"),
        md5(concat(lit("9:"), col("doc_id").cast("string"))).as("h"))
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Vector[(String, Long)], SampleAdmit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, it: Iterator[(String, Long, String)],
            state: GroupState[Vector[(String, Long)]]) =>
          // Sorted ascending by (h, id); worst element last.
          var cur = state.getOption.getOrElse(Vector.empty)
          val admitted = Vector.newBuilder[SampleAdmit]
          // Batch rows processed in rank order: within-batch admissions
          // are deterministic regardless of iterator order (a doc that
          // would be immediately evicted by a better same-batch doc is
          // simply never admitted).
          for ((_, id, h) <- it.toSeq.sortBy(r => (r._3, r._2))) {
            val key = (h, id)
            if (!cur.contains(key)) { // duplicate-delivery idempotence
              if (cur.size < k) {
                cur = (cur :+ key).sorted
                admitted += SampleAdmit(src, id, h)
              } else if (Ordering[(String, Long)].lt(key, cur.last)) {
                cur = (cur.init :+ key).sorted
                admitted += SampleAdmit(src, id, h)
              }
            }
          }
          state.update(cur)
          admitted.result().iterator
      }
  }

  /** A doc arriving for the streaming packer: shard key + text. */
  case class ShardDoc(doc_id: Long, ts: Timestamp, source: String,
      text: String)

  /** One doc's assigned slot in the packed training-sequence layout. */
  case class PackedSlot(source: String, doc_id: Long, seq_id: Long,
      start_pos: Long)

  /** Streaming sequence packing — the incremental face of
    * `pipeline_pack_sequences`: docs stream in per source shard and each
    * is assigned its slot in the concat-and-chunk layout (seq_id = which
    * fixed-length training sequence its first token lands in, start_pos
    * = the offset within it) the moment it arrives — the data loader can
    * start consuming sequence k as soon as the packer's offset passes
    * (k+1)·L, instead of waiting for a batch layout job.
    *
    * Semantics, stated honestly: a packer is ORDER-DEFINED — the layout
    * is a fold over arrival order, so stream==batch parity holds for
    * in-order arrival (StreamsSpec pins it under any batch SPLIT of the
    * in-order stream, plus within-batch shuffling, which the doc_id sort
    * below absorbs). Replay safety is the monotone guard: state carries
    * the highest doc_id packed per shard and drops arrivals at or below
    * it, so Spark's whole-batch replays (always in original order)
    * cannot double-count a shard's offset.
    *
    * State: exactly TWO longs per source shard (next offset, last
    * doc_id) — bounded by |shards|, watermark-free by design like the
    * bottom-k sampler (an idle shard's offset must survive quiet
    * periods). At 100 TB: one (source)-keyed exchange of (id, n) pairs.
    */
  def packSequencesStream(spark: SparkSession, docs: Dataset[ShardDoc],
      seqLen: Long = 512L): Dataset[PackedSlot] = {
    import spark.implicits._
    docs.toDF()
      .select(col("source"), col("doc_id"),
        size(filter(split(col("text"), " "), x => x =!= ""))
          .cast("long").as("n"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), PackedSlot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, it: Iterator[(String, Long, Long)],
            state: GroupState[(Long, Long)]) =>
          var (off, lastId) = state.getOption.getOrElse((0L, Long.MinValue))
          val out = Vector.newBuilder[PackedSlot]
          for ((_, id, n) <- it.toSeq.sortBy(_._2)) {
            if (id > lastId) { // monotone replay guard
              out += PackedSlot(src, id, off / seqLen, off % seqLen)
              off += n
              lastId = id
            }
          }
          state.update((off, lastId))
          out.result().iterator
      }
  }

  /** One boilerplate-segment event: `promoted = true` on the arrival that
    * lifts a segment's document frequency to the threshold; `false` for
    * every later document carrying an already-boilerplate segment.
    */
  case class SegEvent(seg: String, doc_id: Long, df: Long, promoted: Boolean)

  /** Streaming LINE-LEVEL boilerplate detection — the incremental face of
    * `dedup_lines`: arriving docs are segmented MAP-SIDE by the same
    * 3-word-chunk + md5 projection as the batch census, and one GroupState
    * counter per segment digest tracks its document frequency. The
    * arrival that lifts a segment to df = 3 emits `promoted = true`;
    * every later carrier emits a flagged occurrence — the rows a
    * downstream filter drops. Semantics vs batch, stated honestly (the
    * cdcDedupStream rule): the batch census flags EVERY occurrence of a
    * boilerplate segment retroactively; a stream cannot retract, so the
    * first threshold-1 carriers are never flagged — but the SET of
    * promoted segments equals the batch df >= 3 boilerplate set exactly
    * once the same docs have streamed through (LineDedupStreamSpec pins
    * it, plus RocksDB and batch-split invariance). State is ONE long per
    * segment digest active within the TTL window, watermark-evicted —
    * an idle segment forgets its count at the documented re-seed cost.
    */
  def lineDedupStream(spark: SparkSession, docs: Dataset[DocEvent],
      threshold: Long = 3L,
      segTtlSeconds: Long = 3600,
      watermarkDelay: String = "10 minutes"): Dataset[SegEvent] = {
    import spark.implicits._
    docs.toDF()
      .withWatermark("ts", watermarkDelay)
      // guard BEFORE the sequence: sequence(0, -1) generates a DESCENDING
      // range, not an empty one — the same trap the batch query filters.
      .filter(expr("size(split(text, ' ')) >= 3"))
      // Within-doc distinctness is MAP-SIDE (array_distinct before the
      // explode), so df counts DISTINCT docs per segment with NO extra
      // stateful operator — a streaming dropDuplicates("doc_id","seg")
      // here would keep one state row per (doc, segment) pair forever
      // (the event-time column is not part of the dedup key, so nothing
      // evicts), which the StreamBench probe exposed as state growing
      // with input rows. Contract (the packSequences precedent): each
      // doc_id arrives once; a replayed doc would double-count its
      // segments.
      .select(col("doc_id"), col("ts"),
        explode(array_distinct(
          expr("transform(sequence(0, int(size(split(text, ' ')) div 3) - 1), " +
            "i -> md5(concat_ws(' ', slice(split(text, ' '), int(i*3+1), 3))))")))
          .as("seg"))
      .as[(Long, Timestamp, String)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[Long, SegEvent](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout()) {
        (seg: String, it: Iterator[(Long, Timestamp, String)],
            state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var cnt = state.getOption.getOrElse(0L)
            val out = Seq.newBuilder[SegEvent]
            var lastMs = Long.MinValue
            // doc_id order within the batch: which carrier is "the
            // promoter" stays deterministic under arrival permutation.
            for ((doc, ts, _) <- it.toSeq.sortBy(_._1)) {
              cnt += 1
              if (cnt == threshold) out += SegEvent(seg, doc, cnt, promoted = true)
              else if (cnt > threshold) out += SegEvent(seg, doc, cnt, promoted = false)
              lastMs = math.max(lastMs, micros(ts) / 1000L)
            }
            state.update(cnt)
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1000,
              lastMs + segTtlSeconds * 1000L))
            out.result().iterator
          }
      }
  }

  /** One SCD2 version row: closed versions carry `valid_to`; the flush of
    * a user's OPEN version (on event-time timeout) carries none and
    * `current = true`.
    */
  case class Scd2Row(user_id: Long, version_n: Long, event_type: String,
      valid_from: Timestamp, valid_to: Option[Timestamp], n_events: Long,
      current: Boolean)

  /** Open-version accumulator (public: encoder codegen needs access). */
  case class Scd2State(versionN: Long, eventType: String, fromUs: Long,
      lastUs: Long, n: Long)

  /** Streaming SCD TYPE-2 maintenance — the incremental face of
    * `q_events_scd2`: per-user state carries the OPEN dimension version;
    * an arriving event whose type differs CLOSES it (emit with valid_to =
    * the change event's time) and opens the next, an equal-type event
    * just extends the covered count. An event-time timeout (watermark
    * passing lastTs + ttl) FLUSHES the open version as current and evicts
    * the state — so state is bounded by ACTIVE users and the stream's
    * closed ∪ flushed rows reproduce the batch history exactly when
    * arrival respects event time (Scd2StreamSpec pins the parity, the
    * within-batch permutation independence, and the RocksDB provider).
    *
    * Ordering caveat, stated honestly (the sessionizer rule): within a
    * micro-batch events fold in (ts, event_id) order — identical to the
    * batch mirror's sort; ACROSS batches closed versions are final, so a
    * straggler older than the open version's valid_from cannot retro-edit
    * history — it folds into the open version by arrival. Production SCD2
    * feeds (CDC logs) are per-key ordered, which is exactly the case the
    * parity leg certifies.
    */
  def scd2Stream(spark: SparkSession, events: Dataset[Event],
      ttlSeconds: Long = 3600,
      watermarkDelay: String = "10 minutes"): Dataset[Scd2Row] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, Scd2Row](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[Event], state: GroupState[Scd2State]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.toSeq.map(s =>
              Scd2Row(user, s.versionN, s.eventType, tsOfMicros(s.fromUs),
                None, s.n, current = true))
            state.remove()
            out.iterator
          } else {
            val out = Seq.newBuilder[Scd2Row]
            var cur = state.getOption
            var lastUs = cur.map(_.lastUs).getOrElse(Long.MinValue)
            for (e <- it.toSeq.sortBy(e => (micros(e.ts), e.event_id))) {
              val t = micros(e.ts)
              cur match {
                case None =>
                  cur = Some(Scd2State(1L, e.event_type, t, t, 1L))
                case Some(s) if s.eventType == e.event_type =>
                  cur = Some(s.copy(lastUs = math.max(s.lastUs, t), n = s.n + 1))
                case Some(s) =>
                  out += Scd2Row(user, s.versionN, s.eventType,
                    tsOfMicros(s.fromUs), Some(tsOfMicros(t)), s.n,
                    current = false)
                  cur = Some(Scd2State(s.versionN + 1, e.event_type, t, t, 1L))
              }
              lastUs = math.max(lastUs, t)
            }
            cur.foreach(state.update)
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1000,
              lastUs / 1000L + ttlSeconds * 1000L))
            out.result().iterator
          }
      }
  }

  /** One closed hourly bucket scored against its type's RUNNING baseline:
    * z is null-equivalent (NaN-free: flagged=false, z=0) until the
    * baseline has >= 2 closed buckets and positive spread.
    */
  case class BucketScore(event_type: String, hour_epoch: Long, n: Long,
      baseline_n: Long, z: Double, flagged: Boolean)

  /** Welford accumulator over closed buckets + the open bucket
    * (public: encoder codegen needs access).
    */
  case class AnomalyState(hourEpoch: Long, count: Long,
      n: Long, mean: Double, m2: Double)

  /** Streaming VOLUME-ANOMALY detection — the incremental face of
    * `q_events_anomaly`, with the honest streaming twist: a closing
    * bucket is scored PREQUENTIALLY, against the baseline of buckets
    * closed BEFORE it (the batch query scores against global stats
    * including the bucket itself — a stream cannot see the future).
    * The baseline is Welford's online mean/variance — ONE (n, mean, M2)
    * triple per event type, numerically stable, O(1) per bucket — so
    * state is three doubles + the open bucket per ACTIVE type no matter
    * how long the stream runs. Buckets close when an event of a LATER
    * hour arrives (or the event-time timeout flushes the open one);
    * a straggler older than the open hour folds into the open bucket by
    * arrival — the documented divergence, exact parity under per-type
    * event-time order (AnomalyStreamSpec pins it with a sequential
    * Welford reference, batch-split invariance, and RocksDB).
    */
  def anomalyStream(spark: SparkSession, events: Dataset[Event],
      zThreshold: Double = 3.0,
      ttlSeconds: Long = 7200,
      watermarkDelay: String = "10 minutes"): Dataset[BucketScore] = {
    import spark.implicits._
    def close(typ: String, s: AnomalyState): (BucketScore, AnomalyState) = {
      val sd = if (s.n >= 2) math.sqrt(s.m2 / (s.n - 1)) else 0.0
      val z = if (s.n >= 2 && sd > 0) (s.count - s.mean) / sd else 0.0
      val score = BucketScore(typ, s.hourEpoch, s.count, s.n, z,
        flagged = s.n >= 2 && sd > 0 && math.abs(z) >= zThreshold)
      // Welford fold of the closed bucket into the baseline.
      val n1 = s.n + 1
      val d = s.count - s.mean
      val mean1 = s.mean + d / n1
      val m21 = s.m2 + d * (s.count - mean1)
      (score, AnomalyState(-1L, 0L, n1, mean1, m21))
    }
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[AnomalyState, BucketScore](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout()) {
        (typ: String, it: Iterator[Event], state: GroupState[AnomalyState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.filter(_.count > 0)
              .map(s => close(typ, s)._1).toSeq
            state.remove()
            out.iterator
          } else {
            val out = Seq.newBuilder[BucketScore]
            var s = state.getOption.getOrElse(AnomalyState(-1L, 0L, 0L, 0.0, 0.0))
            var lastMs = Long.MinValue
            for (e <- it.toSeq.sortBy(e => (micros(e.ts), e.event_id))) {
              val hour = micros(e.ts) / 3600000000L * 3600L
              if (s.hourEpoch < 0) s = s.copy(hourEpoch = hour, count = 1L)
              else if (hour > s.hourEpoch) {
                val (score, folded) = close(typ, s)
                out += score
                s = folded.copy(hourEpoch = hour, count = 1L)
              } else s = s.copy(count = s.count + 1) // same or older hour
              lastMs = math.max(lastMs, micros(e.ts) / 1000L)
            }
            state.update(s)
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1000,
              lastMs + ttlSeconds * 1000L))
            out.result().iterator
          }
      }
  }
}
