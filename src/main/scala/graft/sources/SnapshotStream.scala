package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** The snapshot table as a STRUCTURED STREAMING SOURCE — tail the change
  * feed with `spark.readStream.format("graft-snapshot").load(table)`:
  * each committed version is one offset, each micro-batch serves
  * [[Snapshots.changesBetween]] over the offset range the engine asks
  * for, and exactly-once delivery falls out of Structured Streaming's
  * checkpointed offset log (a replayed range re-derives the IDENTICAL
  * rows, because the feed is computed from immutable manifests — the
  * property that makes this source trivially replayable where a queue
  * source needs broker-side retention guarantees).
  *
  * Options:
  *  - `path` (or `.load(table)`): the snapshot table directory.
  *  - `startingVersion` (default 0): serve changes AFTER this version;
  *    0 bootstraps with version 1's full content as inserts (the
  *    "initial snapshot + subsequent changes" contract), `latest`
  *    resolves to the current version at FIRST stream start and is then
  *    PINNED in the query's checkpoint (the Delta initial-offset file
  *    pattern) — a crash-restart reuses the pinned value rather than
  *    re-resolving against a table that advanced during downtime, which
  *    would silently skip the in-between versions on bootstrap replay.
  *  - `maxVersionsPerBatch` (default unbounded): ADMISSION CONTROL —
  *    cap how many committed versions one micro-batch may cover (the
  *    Kafka `maxOffsetsPerTrigger` / Delta `maxFilesPerTrigger` knob).
  *    Without it, a consumer resuming after long downtime gets ONE
  *    batch spanning its whole lag — at 100 TB that is an unbounded
  *    shuffle where the operator wanted a paced catch-up. The cap's
  *    high-water mark persists in the query's checkpoint (metadataPath),
  *    so pacing survives restart; a crash between the mark and the
  *    engine's own offset log at worst widens one batch to two caps'
  *    worth — batch BOUNDS always come from the engine's log, so
  *    exactly-once is untouched.
  *  - `maxBytesPerBatch` (default unbounded): BYTE-weighted admission —
  *    versions vary wildly in size (one OPTIMIZE vs a thin append), so
  *    counting versions paces unevenly; this caps the batch by the SUM
  *    of the admitted versions' newly-added file bytes (a stat call per
  *    new file — metadata, never data). At least one version is always
  *    admitted, so an over-cap commit still flows (in its own batch).
  *    Composes with `maxVersionsPerBatch`; same hwm, same exactly-once
  *    argument.
  *
  * Contracts, stated honestly (all Delta-CDF-shaped):
  *  - VACUUM RETENTION bounds consumer lag: a restart that asks for a
  *    vacuumed version range fails loudly at manifest resolution
  *    (never silently skips data). Retain at least the consumer's
  *    maximum downtime worth of versions.
  *  - SCHEMA at stream start is the stream's schema for its lifetime
  *    (a Structured Streaming invariant — plans are bound once): later
  *    evolved columns are dropped from the feed until the stream
  *    restarts; earlier versions' rows null-fill columns they predate.
  *  - getOffset is one directory listing; getBatch cost is O(files the
  *    range's commits touched) — the [[Snapshots.changesBetween]]
  *    bound — so tailing a 100 TB table costs what its commits cost,
  *    not what the table weighs.
  */
class SnapshotSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-snapshot"

  private def tableOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-snapshot source needs a table directory: .load(<table>) " +
        "or .option(\"path\", <table>)"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), SnapshotSourceProvider.feedSchema(tableOf(parameters)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val table = tableOf(parameters)
    val resolved = parameters.get("startingVersion") match {
      case Some("latest") => Snapshots.latestVersion(table)
      case Some(v) => v.toInt
      case None => 0
    }
    // Persist the RESOLVED starting version in the query's checkpoint on
    // FIRST start (create-if-absent, the Delta initial-offset pattern)
    // and reuse it on every restart: createSource runs again after a
    // crash, and re-resolving `latest` against a table that advanced
    // during downtime would silently skip the versions in between when
    // the engine replays its bootstrap batch (getBatch(None, end) uses
    // startingVersion as `from`).
    val starting = SnapshotSourceProvider
      .pinnedStartingVersion(metadataPath, resolved)
    val cap = parameters.get("maxVersionsPerBatch").map(_.toInt)
      .getOrElse(Int.MaxValue)
    require(cap >= 1, s"maxVersionsPerBatch must be >= 1, got $cap")
    val byteCap = parameters.get("maxBytesPerBatch").map(_.toLong)
      .getOrElse(Long.MaxValue)
    require(byteCap >= 1, s"maxBytesPerBatch must be >= 1, got $byteCap")
    new SnapshotChangesSource(sqlContext, table, starting, cap,
      metadataPath, byteCap)
  }
}

object SnapshotSourceProvider {
  /** Read-or-pin the stream's starting version in `metadataPath`:
    * returns the previously pinned value if one exists, else atomically
    * creates the pin with `resolved` (create-if-absent — a concurrent
    * racer's pin wins and is returned, so every driver agrees). An empty
    * metadataPath (bare unit-test construction) pins nothing.
    */
  def pinnedStartingVersion(metadataPath: String, resolved: Int): Int = {
    import java.nio.file.{Files, Paths, StandardOpenOption}
    if (metadataPath.isEmpty) return resolved
    val dir = Paths.get(metadataPath.stripPrefix("file:"))
    val pin = dir.resolve("graft-starting-version")
    if (Files.exists(pin)) Files.readString(pin).trim.toInt
    else {
      Files.createDirectories(dir)
      try {
        Files.writeString(pin, resolved.toString, StandardOpenOption.CREATE_NEW)
        resolved
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.readString(pin).trim.toInt
      }
    }
  }

  /** The feed's schema: the table schema at stream start plus the two
    * change columns. Requires a committed version (a stream over a
    * never-published table has no schema to bind).
    */
  def feedSchema(table: String): StructType = {
    val latest = Snapshots.latestVersion(table)
    require(latest >= 1,
      s"$table has no committed version to stream from")
    val base = Snapshots.tableSchema(table, latest).getOrElse(
      throw new IllegalArgumentException(
        s"$table (a pre-schema-tracking table) cannot be streamed"))
    StructType(base.fields ++ Seq(
      StructField("_change_type", StringType),
      StructField("_commit_version", LongType)))
  }
}

/** V1 streaming Source over the snapshot table's change feed. Offsets
  * are COMMITTED VERSION NUMBERS — already total-ordered and durable by
  * the table's own commit protocol, so the source keeps no state of its
  * own: progress lives in the query's checkpoint, history in the
  * table's manifests, and `getBatch(start, end]` is a pure function of
  * both (replay-identical by construction).
  */
class SnapshotChangesSource(sqlContext: SQLContext, table: String,
    startingVersion: Int, maxVersionsPerBatch: Int = Int.MaxValue,
    metadataPath: String = "",
    maxBytesPerBatch: Long = Long.MaxValue) extends Source {

  private val declared = SnapshotSourceProvider.feedSchema(table)

  override def schema: StructType = declared

  /** Pacing high-water mark: the highest version this source has OFFERED
    * as a batch end. Persisted in the query's checkpoint (metadataPath)
    * so the cap keeps pacing across restart — without it a restarted
    * source would re-offer `committed + cap` from scratch, which is
    * still correct (bounds come from the engine's offset log) but could
    * momentarily widen a batch. The mark is advisory, never a
    * correctness input: getBatch serves exactly the (start, end] the
    * ENGINE asks for, whatever the mark says.
    */
  private def hwmFile: Option[java.nio.file.Path] =
    if (metadataPath.isEmpty ||
        (maxVersionsPerBatch == Int.MaxValue &&
          maxBytesPerBatch == Long.MaxValue)) None
    else Some(java.nio.file.Paths.get(
      metadataPath.stripPrefix("file:")).resolve("graft-pacing-hwm"))

  private def readHwm(): Int = hwmFile match {
    case Some(p) if java.nio.file.Files.exists(p) =>
      java.nio.file.Files.readString(p).trim.toInt
    case _ => startingVersion
  }

  private def writeHwm(v: Int): Unit = hwmFile.foreach { p =>
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, v.toString)
  }

  override def getOffset: Option[V1Offset] = {
    val latest = Snapshots.latestVersion(table)
    val cur = math.max(math.max(startingVersion, 0), readHwm())
    if (latest <= cur) None
    else {
      // Admit versions until either cap trips. The BYTE cap paces by what
      // a version actually WEIGHS (its newly added data + DV file bytes —
      // one metadata stat per file, no data read): one OPTIMIZE commit
      // and ten thin appends are wildly different batch costs under a
      // version-count cap but pace evenly here. The first version is
      // always admitted (an over-cap fat commit must still make
      // progress), so the mark only bounds ACCUMULATION, never liveness.
      var next = cur
      var bytes = 0L
      var open = true
      while (open && next < latest && (next - cur) < maxVersionsPerBatch) {
        val add =
          if (maxBytesPerBatch == Long.MaxValue) 0L
          else Snapshots.versionAddedBytes(table, next + 1)
        if (next == cur || bytes + add <= maxBytesPerBatch) {
          bytes += add; next += 1
        } else open = false
      }
      if (next <= cur) None
      else {
        writeHwm(next)
        Some(LongOffset(next.toLong))
      }
    }
  }

  private def versionOf(o: V1Offset): Int = o match {
    case l: LongOffset => l.offset.toInt
    case other => other.json().trim.stripPrefix("\"").stripSuffix("\"").toInt
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(startingVersion)
    val to = versionOf(end)
    // A restart replay can carry an engine-logged end beyond our mark
    // (crash between the engine's offset write and ours): re-sync so the
    // next getOffset paces from what was actually served.
    if (to > readHwm()) writeHwm(to)
    val feed = Snapshots.changesBetween(
      sqlContext.sparkSession, table, from, Some(to))
    // Bind to the DECLARED schema: steps that predate an evolved column
    // null-fill it; columns evolved after stream start are dropped
    // (picked up on restart) — the streaming fixed-schema invariant.
    val have = feed.columns.toSet
    val bound = feed.select(declared.fields.toIndexedSeq.map { f =>
      if (have.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
    // MicroBatchExecution asserts the returned frame is streaming-tagged;
    // re-wrap the batch plan's RDD under the streaming flag (the V1
    // connector pattern — see StreamingShim).
    org.apache.spark.sql.graft.StreamingShim.asStreamingFrame(
      sqlContext.sparkSession, bound.queryExecution.toRdd, declared)
  }

  override def stop(): Unit = ()

  override def toString: String =
    s"SnapshotChangesSource[$table, starting=$startingVersion]"
}
