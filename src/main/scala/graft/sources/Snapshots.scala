package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}

/** Manifest-committed snapshot table — the transactional-publish primitive
  * under every lakehouse table format: a reader must see either the table
  * BEFORE a write or the table AFTER it, never a half-written mixture, and
  * every published version stays readable (time travel).
  *
  * Mechanics (the Delta/Iceberg idea reduced to its load-bearing core):
  * data files are immutable and carry no meaning by themselves — a file
  * EXISTS in the table only if a committed manifest lists it. A publish
  *  1. stages the DataFrame's parquet files into `data/` under
  *     version-prefixed names (crash here leaves ORPHANS — garbage, not
  *     corruption: no manifest references them, so readers never see them),
  *  2. writes the manifest `_manifests/v<N>.json` listing exactly its
  *     files (crash here: manifest absent or half-written and unreferenced
  *     by `_latest` — still invisible),
  *  3. flips the `_latest` pointer by ATOMIC RENAME — the single commit
  *     point; before it readers resolve v(N-1), after it v(N).
  *
  * SCHEMA EVOLUTION (round 8): every commit records its TABLE SCHEMA as
  * version metadata (`_schemas/v<N>.json`, published by the same pointer
  * flip). [[addColumns]] is a METADATA-ONLY commit — same files, wider
  * schema, O(1) at any table size — and [[read]] applies the version's
  * declared schema so pre-evolution files null-fill the new columns at
  * scan time, with no 100 TB footer-merge (`mergeSchema`) pass and no
  * rewrite. [[append]] gates on schema compatibility (new columns only
  * under `mergeSchema = true`; type drift always fails); time travel to
  * a pre-evolution version reads the old schema. Renames/drops are out
  * of scope, honestly: name-based column resolution cannot express them
  * — that is precisely what Iceberg-style column IDs buy.
  *
  * Scope, stated honestly: single-writer, POSIX-rename atomicity — the
  * local-FS/HDFS form. Object stores without atomic rename replace step 3
  * with a compare-and-swap on a log entry (the actual difference between
  * this sketch and a production table format); the READER contract —
  * manifest-listed files only, orphans invisible, versions immutable — is
  * identical and is what SnapshotsSpec certifies.
  */
object Snapshots {

  private def dirOf(table: String, sub: String): Path = {
    val p = Paths.get(table, sub)
    Files.createDirectories(p)
    p
  }

  /** Highest committed version per `_latest`, or 0 if never published.
    * The pointer file carries "version [batchId]" — one atomic rename
    * commits BOTH, which is what makes the streaming append exactly-once
    * (a separate batch-tracking file would open a crash window between
    * the data commit and the batch record).
    */
  def latestVersion(table: String): Int = {
    val ptr = Paths.get(table, "_latest")
    if (Files.exists(ptr)) Files.readString(ptr).trim.split("\\s+")(0).toInt
    else 0
  }

  /** Highest streaming batchId committed into `table`, or -1. */
  def lastBatchId(table: String): Long = {
    val ptr = Paths.get(table, "_latest")
    if (!Files.exists(ptr)) return -1L
    val parts = Files.readString(ptr).trim.split("\\s+")
    if (parts.length > 1) parts(1).toLong else -1L
  }

  /** Publish `df` as version latest+1 of `table` (a FULL-rewrite commit:
    * the manifest lists only this version's files); returns the version.
    */
  def publish(df: DataFrame, table: String): Int = {
    val v = latestVersion(table) + 1
    commit(table, v, stageFiles(df, table, v), schema = Some(df.schema))
  }

  private def schemaPath(table: String, v: Int): Path =
    Paths.get(table, "_schemas", f"v$v%05d.json")

  /** The TABLE SCHEMA committed with version `v`, if one was recorded.
    * Schema-in-metadata is what makes evolution work at scale: the
    * reader applies ONE declared schema (absent columns in older files
    * null-fill) instead of merging every file's footer — at 100 TB,
    * parquet `mergeSchema` is a scan of every footer in the table just
    * to start the query, and it cannot represent "this column exists
    * but no file has it yet" (a metadata-only ADD COLUMN). Tables
    * published before schema tracking read schema-on-file (None).
    */
  def tableSchema(table: String, v: Int): Option[StructType] = {
    val p = schemaPath(table, v)
    if (Files.exists(p))
      Some(DataType.fromJson(Files.readString(p)).asInstanceOf[StructType])
    else None
  }

  /** Manifest file list of a committed version. */
  private def manifestFiles(table: String, v: Int): Seq[String] = {
    val manifest = Paths.get(table, "_manifests", f"v$v%05d.json")
    require(Files.exists(manifest), s"version $v of $table was never committed")
    Files.readString(manifest).trim
      .stripPrefix("[").stripSuffix("]").split(",")
      .map(_.trim.stripPrefix("\"").stripSuffix("\""))
      .filter(_.nonEmpty).toSeq
  }

  /** Per-file column min/max recorded at commit time (`_stats/v<N>.tsv`,
    * one `file col tag min max` line per numeric top-level column; tag
    * `L` = integral, `D` = floating). The stats come from the parquet
    * FOOTERS the writer already produced — no data pass — and a file's
    * entry is computed ONCE: carried-over files inherit their entry from
    * the previous version's stats (files are immutable, so their stats
    * are too), so a commit's stats cost is O(new files), matching the
    * O(new data) commit contract. This is the Iceberg/Delta manifest-
    * stats idea: at 100 TB a reader must be able to PLAN a range query
    * from metadata alone — [[pruneFiles]]/[[readRange]] skip files whose
    * [min,max] cannot intersect the predicate without opening them,
    * turning a clustered table's point/range read into an O(matching
    * files) operation instead of an O(table) footer crawl.
    */
  private def statsPath(table: String, v: Int): Path =
    Paths.get(table, "_stats", f"v$v%05d.tsv")

  /** Parsed stats of version `v`: file -> column -> (tag, min, max).
    * Absent file (legacy/pre-stats version) reads as empty — every
    * consumer treats missing stats as "cannot prune" (conservative).
    */
  def statsFor(table: String, v: Int): Map[String, Map[String, (String, String, String)]] = {
    val p = statsPath(table, v)
    if (v < 1 || !Files.exists(p)) return Map.empty
    Files.readString(p).split("\n").filter(_.nonEmpty).toSeq
      .map(_.split("\t", -1))
      .groupBy(_(0))
      .map { case (file, rows) =>
        file -> rows.filter(_(1) != "-")
          .map(r => r(1) -> ((r(2), r(3), r(4)))).toMap
      }
  }

  /** Footer-read min/max for one data file's numeric top-level columns.
    * Row-group stats combine per column; a column whose every chunk is
    * null-only (or non-numeric) gets no entry and is never pruned on.
    * NULL rows can't satisfy a range predicate, so min/max over non-null
    * values alone is a sound pruning bound.
    */
  private def footerStats(p: Path): Map[String, (String, String, String)] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(p.toUri),
      new org.apache.hadoop.conf.Configuration())
    val reader = ParquetFileReader.open(in)
    try {
      val perChunk = reader.getFooter.getBlocks.asScala.flatMap { b =>
        b.getColumns.asScala.flatMap { c =>
          val s = c.getStatistics
          if (c.getPath.size != 1 || s == null || !s.hasNonNullValue) None
          else c.getPrimitiveType.getPrimitiveTypeName match {
            case INT64 | INT32 =>
              Some((c.getPath.toDotString,
                ("L", s.genericGetMin.toString, s.genericGetMax.toString)))
            case DOUBLE | FLOAT =>
              Some((c.getPath.toDotString,
                ("D", s.genericGetMin.toString, s.genericGetMax.toString)))
            case _ => None
          }
        }
      }
      perChunk.groupBy(_._1).map { case (col, chunks) =>
        val tag = chunks.head._2._1
        def num(x: String) = BigDecimal(x)
        col -> ((tag,
          chunks.map(c => num(c._2._2)).min.bigDecimal.toPlainString,
          chunks.map(c => num(c._2._3)).max.bigDecimal.toPlainString))
      }.toMap
    } finally reader.close()
  }

  private def commit(table: String, v: Int, names: Seq[String],
      batchId: Long = -1L, schema: Option[StructType] = None): Int = {
    // Schema (when tracked) is version metadata like the manifest: both
    // are mere debris until the pointer flip below publishes them.
    schema.foreach { s =>
      Files.writeString(dirOf(table, "_schemas").resolve(f"v$v%05d.json"),
        s.json)
    }
    // File stats: inherit carried files' entries, footer-read only the
    // new ones (a `-` marker remembers a genuinely stat-less file so it
    // is never re-read). Metadata like the schema: debris until the flip.
    val prevStats = statsFor(table, v - 1)
    val statLines = names.flatMap { n =>
      val cols = prevStats.getOrElse(n,
        footerStats(Paths.get(table, "data", n)))
      if (cols.isEmpty) Seq(s"$n\t-\t-\t-\t-")
      else cols.toSeq.sortBy(_._1).map { case (c, (tag, mn, mx)) =>
        s"$n\t$c\t$tag\t$mn\t$mx"
      }
    }
    Files.writeString(dirOf(table, "_stats").resolve(f"v$v%05d.tsv"),
      statLines.mkString("\n"))
    val manifest = dirOf(table, "_manifests").resolve(f"v$v%05d.json")
    Files.writeString(manifest,
      names.map(n => "\"" + n + "\"").mkString("[", ",", "]"))
    val tmp = Paths.get(table, s"_latest.tmp-$v")
    // Carry forward the streaming batch watermark on non-streaming
    // commits so an interleaved publish/compact can't reopen replayed
    // batches.
    val bid = if (batchId >= 0) batchId else lastBatchId(table)
    Files.writeString(tmp, s"$v $bid")
    Files.move(tmp, Paths.get(table, "_latest"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    v
  }

  /** EXACTLY-ONCE streaming append — the transactional-sink recipe for
    * `writeStream.foreachBatch`: Structured Streaming re-runs a batch
    * after a failure, so the sink must make `(batchId, data) -> commit`
    * idempotent. The committed batchId rides IN the `_latest` pointer, so
    * the data commit and the batch record are ONE atomic rename — a
    * replayed batch (batchId <= the committed watermark) is a no-op, and
    * there is no crash window where data committed but the batch record
    * didn't (the flaw of tracking batches in a second file). Returns
    * true iff this call committed.
    */
  def appendBatch(df: DataFrame, table: String, batchId: Long): Boolean = {
    require(batchId >= 0, s"batchId must be >= 0, got $batchId")
    if (batchId <= lastBatchId(table)) return false
    val prev = latestVersion(table)
    val v = prev + 1
    val prevFiles = if (prev >= 1) manifestFiles(table, prev) else Seq.empty
    val sch =
      if (prev >= 1) checkedSchema(df, table, prev, mergeSchema = false)
      else Some(df.schema)
    commit(table, v, prevFiles ++ stageFiles(df, table, v), batchId, sch)
    true
  }

  /** Schema-compat gate for appends into a schema-tracked table: the
    * incoming frame must carry every table column; extra columns EVOLVE
    * the schema (appended, nullable) only under `mergeSchema` — without
    * it they fail loudly instead of silently vanishing behind the
    * declared read schema. Legacy tables (no tracked schema) pass
    * through unchecked, as before tracking existed.
    */
  private def checkedSchema(df: DataFrame, table: String, prev: Int,
      mergeSchema: Boolean): Option[StructType] =
    tableSchema(table, prev).map { cur =>
      val have = df.schema.fieldNames.toSet
      val missing = cur.fieldNames.filterNot(have)
      require(missing.isEmpty,
        s"append into $table is missing table columns: ${missing.mkString(",")}")
      // A type drift would stage files the declared read schema can't
      // decode — fail at commit time, not in some later reader.
      val drift = cur.fields.flatMap { f =>
        df.schema.fields.find(_.name == f.name)
          .filter(_.dataType != f.dataType)
          .map(g => s"${f.name}: ${g.dataType.simpleString} vs table " +
            f.dataType.simpleString)
      }
      require(drift.isEmpty,
        s"append into $table changes column types: ${drift.mkString("; ")}")
      val extra = df.schema.fields.filterNot(f => cur.fieldNames.contains(f.name))
      if (extra.isEmpty) cur
      else {
        require(mergeSchema,
          s"append into $table carries new columns " +
            s"${extra.map(_.name).mkString(",")}; pass mergeSchema = true " +
            "to evolve the table schema")
        StructType(cur.fields ++ extra.map(_.copy(nullable = true)))
      }
    }

  /** Stage `df`'s parquet parts into `data/` under version-prefixed
    * immutable names; returns the new file names (not yet committed).
    */
  private def stageFiles(df: DataFrame, table: String, v: Int): Seq[String] = {
    val dataDir = dirOf(table, "data")
    val stage = Files.createTempDirectory(Paths.get(table), s"stage-v$v-")
    def write(d: DataFrame): Seq[Path] = {
      d.write.mode("overwrite").parquet(stage.toString)
      val listing = Files.list(stage)
      try listing.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .toSeq.sortBy(_.toString)
      finally listing.close()
    }
    val first = write(df)
    // An all-empty-partitions frame may legally produce ZERO part files;
    // committing an empty manifest would strand read() with no schema to
    // return. Force one schema-only part instead so an empty commit stays
    // readable as an empty table.
    val parts = if (first.nonEmpty) first else write(df.repartition(1))
    require(parts.nonEmpty, s"no parquet part could be staged for $table v$v")
    val names = parts.zipWithIndex.map { case (p, i) =>
      val name = f"v$v%05d-part$i%05d.parquet"
      // REPLACE_EXISTING: names are version-scoped, so under the stated
      // single-writer model a collision can only be debris from our own
      // crashed attempt at this same (uncommitted) version — without it
      // the retry wedges on FileAlreadyExistsException until a vacuum.
      Files.move(p, dataDir.resolve(name), StandardCopyOption.REPLACE_EXISTING)
      name
    }
    val walk = Files.walk(stage)
    try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally walk.close()
    names
  }

  /** APPEND commit: version latest+1 whose manifest is the previous
    * version's file list PLUS `df`'s new files — existing data files are
    * reused byte-for-byte (manifests share immutable files; only the new
    * rows are written). The atomic-rename commit point is identical to
    * [[publish]], so a reader sees the table without the appended rows or
    * with ALL of them.
    */
  def append(df: DataFrame, table: String,
      mergeSchema: Boolean = false): Int = {
    val prev = latestVersion(table)
    require(prev >= 1, s"$table has no committed version to append to")
    val v = prev + 1
    val sch = checkedSchema(df, table, prev, mergeSchema)
    commit(table, v, manifestFiles(table, prev) ++ stageFiles(df, table, v),
      schema = sch)
  }

  /** ADD COLUMN — METADATA-ONLY schema evolution: version latest+1 with
    * the SAME file list and the schema extended by `fields` (forced
    * nullable — existing rows have no value). This is an O(1) commit at
    * any table size: no file is read, rewritten, or moved — the new
    * column exists because the declared read schema says so, and every
    * pre-evolution file null-fills it at scan time. Subsequent
    * [[append]]/[[merge]] commits carry real values; TIME TRAVEL to a
    * pre-evolution version reads the OLD schema (schema is versioned
    * with the data it described). Name collisions fail loudly. Legacy
    * tables (published before schema tracking) get their baseline
    * schema derived from the current files once, here.
    */
  def addColumns(spark: SparkSession, table: String,
      fields: StructField*): Int = {
    val prev = latestVersion(table)
    require(prev >= 1, s"$table has no committed version to evolve")
    val base = tableSchema(table, prev)
      .getOrElse(read(spark, table).schema)
    val clash = fields.map(_.name).filter(base.fieldNames.contains)
    require(clash.isEmpty,
      s"$table already has column(s) ${clash.mkString(",")}")
    val evolved = StructType(base.fields ++ fields.map(_.copy(nullable = true)))
    commit(table, prev + 1, manifestFiles(table, prev), schema = Some(evolved))
  }

  /** COMPACTION commit: rewrite the latest version's rows as `n`
    * range-partitioned, internally-sorted files ([[Compaction]]'s layout)
    * and publish them as a new version — same rows, fewer/better files,
    * and the pre-compaction version stays readable (time travel is the
    * undo). The old files are NOT deleted: vacuuming uncommitted/old
    * files is a separate concern from correctness, exactly as in
    * production formats.
    */
  def compact(spark: SparkSession, table: String, n: Int,
      cols: org.apache.spark.sql.Column*): Int = {
    val v = latestVersion(table) + 1
    val compacted = Compaction.compactToRange(read(spark, table), n, cols: _*)
    commit(table, v, stageFiles(compacted, table, v),
      schema = Some(compacted.schema))
  }

  /** Z-ORDER compaction commit: the latest version's rows rewritten
    * through [[ZOrder.compactToZ]]'s Morton-curve layout as a new
    * version — the two-dimensional sibling of [[compact]], committing
    * files whose footer min/max bound BOTH caller-normalized keys (the
    * layout ZOrderSpec certifies), with the pre-compaction version as
    * the undo. Same stage/manifest/pointer-flip path as every commit.
    */
  def compactZ(spark: SparkSession, table: String, n: Int,
      a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): Int = {
    val v = latestVersion(table) + 1
    val z = ZOrder.compactToZ(read(spark, table), n, a, b)
    commit(table, v, stageFiles(z, table, v), schema = Some(z.schema))
  }

  private def baseName(fileUri: String): String =
    fileUri.substring(fileUri.lastIndexOf('/') + 1)

  /** DELETE commit (row-level, copy-on-write): version latest+1 without
    * the rows matching `pred`. Only files that CONTAIN a matching row are
    * rewritten (filtered); every untouched file is carried into the new
    * manifest byte-for-byte — file-granularity copy-on-write, the shape
    * production formats run for GDPR-style deletes, with the pre-delete
    * version as the time-travel undo. The one driver-side collect is the
    * touched FILE-NAME list — metadata-scale (bounded by file count, the
    * `findTouchedFiles` step of every lakehouse MERGE/DELETE), never rows;
    * at 100 TB the find pass is one predicate scan (prunable by footer
    * min/max when the table is [[compact]]/[[compactZ]]-clustered on the
    * predicate columns) and the rewrite touches only matching files.
    * A delete that matches nothing commits NO new version and returns the
    * current one (the Delta semantics: empty commits are elided).
    */
  def deleteWhere(spark: SparkSession, table: String,
      pred: org.apache.spark.sql.Column): Int = {
    import org.apache.spark.sql.functions.{input_file_name, not}
    val prev = latestVersion(table)
    require(prev >= 1, s"$table has no committed version to delete from")
    val prevNames = manifestFiles(table, prev)
    // Tag the source file at the SCAN (a projection directly over it —
    // input_file_name() is unreliable above exchanges), then find the
    // files holding at least one matching row.
    val touched: Set[String] =
      read(spark, table).withColumn("_graft_file", input_file_name())
        .filter(pred).select("_graft_file").distinct()
        .collect().map(r => baseName(r.getString(0))).toSet
    if (touched.isEmpty) return prev
    val keep = prevNames.filterNot(touched)
    val survivors = readFiles(spark, table, prev,
      prevNames.filter(touched)).filter(not(pred))
    val v = prev + 1
    commit(table, v, keep ++ stageFiles(survivors, table, v),
      schema = tableSchema(table, prev))
  }

  /** Read a subset of a version's files UNDER THAT VERSION'S SCHEMA —
    * the rewrite paths (delete/merge) must see evolved columns even in
    * pre-evolution files (null-filled), or a predicate/projection on an
    * evolved column would fail against exactly the files it needs to
    * rewrite.
    */
  private def readFiles(spark: SparkSession, table: String, v: Int,
      names: Seq[String]): DataFrame = {
    val paths = names.map(n => Paths.get(table, "data", n).toString)
    tableSchema(table, v) match {
      case Some(s) => spark.read.schema(s).parquet(paths: _*)
      case None => spark.read.parquet(paths: _*)
    }
  }

  /** MERGE commit (upsert-as-commit, last-writer-wins on `key`): rows of
    * `delta` REPLACE current rows sharing their key and INSERT otherwise,
    * as one transactional version — the `pipeline_upsert` decision rule
    * committed under the same stage→manifest→pointer contract, with the
    * pre-merge version as undo. File-granularity copy-on-write: touched
    * files = files holding a key present in `delta` (one scan semi-joined
    * against the delta keys — broadcast when delta is dimension-sized);
    * only their non-delta-key rows are rewritten, delta rows become new
    * files, untouched files carry over byte-for-byte. Driver-side collect
    * is the same metadata-scale file-name list as [[deleteWhere]].
    * `delta` must carry the table's columns (matched by name).
    *
    * TOMBSTONES (`deleteFlag`): a CDC feed is upserts AND deletes in one
    * batch, and they must land in ONE transaction (a reader must never
    * see the upserts without the deletes). When `deleteFlag` names a
    * boolean column of `delta`, flagged rows are tombstones: their keys
    * are REMOVED (they still count toward the touched-file set — a
    * tombstoned key's file must be rewritten — but contribute no output
    * row), unflagged rows upsert as usual. The flag column itself is
    * not written to the table.
    */
  def merge(spark: SparkSession, table: String, delta: DataFrame,
      key: String, deleteFlag: Option[String] = None): Int = {
    import org.apache.spark.sql.functions.{col, input_file_name, not}
    val prev = latestVersion(table)
    require(prev >= 1, s"$table has no committed version to merge into")
    val prevNames = manifestFiles(table, prev)
    val cur = read(spark, table)
    val upserts = deleteFlag match {
      case Some(f) => delta.filter(not(col(f)))
      case None => delta
    }
    val aligned = upserts.select(cur.columns.map(col).toIndexedSeq: _*)
    // Touched files are found against ALL delta keys (tombstoned keys
    // included — deleting a row rewrites its file too).
    val keys = delta.select(key).distinct()
    val touched: Set[String] =
      cur.withColumn("_graft_file", input_file_name())
        .join(keys, Seq(key), "left_semi")
        .select("_graft_file").distinct()
        .collect().map(r => baseName(r.getString(0))).toSet
    val keep = prevNames.filterNot(touched)
    val touchedNames = prevNames.filter(touched)
    val newData =
      if (touchedNames.isEmpty) aligned
      else readFiles(spark, table, prev, touchedNames)
        .join(keys, Seq(key), "left_anti")
        .select(cur.columns.map(col).toIndexedSeq: _*)
        .unionByName(aligned)
    val v = prev + 1
    commit(table, v, keep ++ stageFiles(newData, table, v),
      schema = tableSchema(table, prev))
  }

  /** Partition version `v`'s files into (kept, skipped) for a range
    * predicate `column BETWEEN lo AND hi`, using only the committed
    * per-file stats — no file is opened. A file is skipped ONLY when its
    * recorded [min,max] provably cannot intersect [lo,hi]; files with no
    * stats for `column` (legacy versions, non-numeric or all-null
    * columns) are conservatively kept. On a [[compact]]/[[compactZ]]-
    * clustered table this is the metadata-only file skipping that makes
    * a 100 TB range read O(matching files): the driver reads one small
    * TSV, not N footers.
    */
  def pruneFiles(table: String, column: String, lo: Long, hi: Long,
      version: Option[Int] = None): (Seq[String], Seq[String]) = {
    val v = version.getOrElse(latestVersion(table))
    val stats = statsFor(table, v)
    manifestFiles(table, v).partition { n =>
      stats.get(n).flatMap(_.get(column)) match {
        case Some(("L", mn, mx)) => !(mx.toLong < lo || mn.toLong > hi)
        case Some((_, mn, mx)) => !(mx.toDouble < lo || mn.toDouble > hi)
        case None => true // no stats: cannot prove non-overlap, keep
      }
    }
  }

  /** Range read with manifest-stats file skipping: scan only the files
    * [[pruneFiles]] keeps, then apply `column BETWEEN lo AND hi` as the
    * residual row filter (stats bound files, not rows). Semantically
    * identical to `read(...).filter(between)` — SnapshotsStatsSpec pins
    * the equality — but the plan's file list is pruned before Spark ever
    * lists or opens a skipped file.
    */
  def readRange(spark: SparkSession, table: String, column: String,
      lo: Long, hi: Long, version: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    val latest = latestVersion(table)
    val v = version.getOrElse(latest)
    require(v >= 1 && v <= latest,
      s"version $v of $table is not committed (latest is $latest)")
    val (keep, _) = pruneFiles(table, column, lo, hi, Some(v))
    if (keep.isEmpty) {
      val sch = tableSchema(table, v).getOrElse(read(spark, table, Some(v)).schema)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], sch)
    } else readFiles(spark, table, v, keep)
      .filter(col(column) >= lo && col(column) <= hi)
  }

  /** CHANGE DATA FEED: the rows that changed AFTER `fromVersion`, up to
    * and including `toVersion` (default latest), tagged `_change_type`
    * ('insert' | 'delete' — an update is its delete+insert pair) and
    * `_commit_version`. Because data files are immutable and every
    * version is a manifest, the feed needs NO commit-time change log:
    * per version step, rows of (manifest(v) \ manifest(v-1)) files are
    * candidate inserts, rows of (manifest(v-1) \ manifest(v)) candidate
    * deletes, and the bag-difference (`exceptAll`) cancels the rows a
    * copy-on-write rewrite merely CARRIED into a new file — so a
    * compaction (same rows, new files) correctly yields an EMPTY feed,
    * and a metadata-only commit diffs as nothing without reading a byte.
    * Cost per step is O(files the commit touched), never O(table) —
    * exactly the bound the copy-on-write writers guarantee — and the
    * diff is one hash-exchange over those rows (exceptAll), no window,
    * no driver rows. Both sides of a step read under the LATER version's
    * schema (schemas only widen), so an evolved-column backfill diffs as
    * the value change it is. This is the reader-side dual of
    * incremental view maintenance: a downstream aggregate consumes the
    * feed instead of rescanning history (`pipeline_incremental_agg`
    * holds the writer-side half).
    */
  def changesBetween(spark: SparkSession, table: String, fromVersion: Int,
      toVersion: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val latest = latestVersion(table)
    val to = toVersion.getOrElse(latest)
    require(fromVersion >= 1 && fromVersion <= to && to <= latest,
      s"change range ($fromVersion, $to] outside committed range [1, $latest]")
    val steps = ((fromVersion + 1) to to).flatMap { v =>
      val prevF = manifestFiles(table, v - 1).toSet
      val curF = manifestFiles(table, v).toSet
      val added = (curF -- prevF).toSeq.sorted
      val removed = (prevF -- curF).toSeq.sorted
      def tag(df: DataFrame, typ: String) =
        df.withColumn("_change_type", lit(typ))
          .withColumn("_commit_version", lit(v.toLong))
      (added.nonEmpty, removed.nonEmpty) match {
        case (false, false) => Seq.empty // metadata-only commit
        case (true, false) =>
          Seq(tag(readFiles(spark, table, v, added), "insert"))
        case (false, true) =>
          Seq(tag(readFiles(spark, table, v, removed), "delete"))
        case _ =>
          val a = readFiles(spark, table, v, added)
          val r = readFiles(spark, table, v, removed)
          Seq(tag(a.exceptAll(r), "insert"), tag(r.exceptAll(a), "delete"))
      }
    }
    steps.reduceOption(_.unionByName(_)).getOrElse {
      val base = tableSchema(table, to)
        .getOrElse(read(spark, table, Some(to)).schema)
      val sch = StructType(base.fields ++ Seq(
        StructField("_change_type", StringType),
        StructField("_commit_version", LongType)))
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], sch)
    }
  }

  /** Read a committed version (default: latest). Only manifest-listed
    * files are loaded — orphaned data files are invisible by design.
    */
  def read(spark: SparkSession, table: String,
      version: Option[Int] = None): DataFrame = {
    val latest = latestVersion(table)
    val v = version.getOrElse(latest)
    require(v >= 1, s"$table has no committed version")
    // A manifest file alone is NOT a commit — after a crash between the
    // manifest write and the pointer flip, a v(latest+1) manifest exists
    // (possibly truncated-but-parseable) while `_latest` still says
    // latest. Time travel must fail loudly on such versions, exactly
    // like expired ones, or a reader silently sees uncommitted data.
    require(v <= latest,
      s"version $v of $table is not committed (latest is $latest)")
    readFiles(spark, table, v, manifestFiles(table, v))
  }

  /** VACUUM — the lifecycle step correctness deliberately leaves out of
    * the commit path: drop manifests older than the newest `retainLast`
    * versions, then delete every file under `data/` that NO retained
    * manifest references (expired versions' exclusive files, crashed-
    * stage orphans) plus leftover stage directories. The deletion rule
    * is allow-list shaped — anything referenced by ANY retained manifest
    * survives, whatever its name — so shared files from append chains
    * are never pulled out from under a retained version. Returns the
    * deleted data-file names. After a vacuum, retained versions read
    * byte-identically and expired versions fail LOUDLY (manifest gone),
    * never partially.
    */
  def vacuum(table: String, retainLast: Int = 2): Seq[String] = {
    require(retainLast >= 1, "must retain at least the latest version")
    val latest = latestVersion(table)
    require(latest >= 1, s"$table has no committed version")
    val keepFrom = math.max(1, latest - retainLast + 1)
    val manifestDir = Paths.get(table, "_manifests")
    val live: Set[String] =
      (keepFrom to latest).flatMap { v =>
        // Retention INCREASED after a tighter vacuum: versions below the
        // previous keepFrom have no manifest anymore. They are expired,
        // not corrupt — skip them instead of aborting the whole vacuum.
        val m = manifestDir.resolve(f"v$v%05d.json")
        if (Files.exists(m)) manifestFiles(table, v) else Seq.empty
      }.toSet
    // 1. expire old manifests FIRST: a reader racing the vacuum fails at
    // manifest resolution (loud), never on a half-deleted file list.
    val ml = Files.list(manifestDir)
    try ml.iterator().asScala.toSeq.foreach { m =>
      val v = m.getFileName.toString.stripPrefix("v").stripSuffix(".json").toInt
      if (v < keepFrom) Files.delete(m)
    } finally ml.close()
    // Schema and stats metadata expire with their manifest: an expired
    // version must fail at resolution, not resolve to files read under a
    // ghost schema or pruned by ghost stats.
    for (sub <- Seq("_schemas", "_stats")) {
      val mdDir = Paths.get(table, sub)
      if (Files.isDirectory(mdDir)) {
        val sl = Files.list(mdDir)
        try sl.iterator().asScala.toSeq.foreach { m =>
          val v = m.getFileName.toString.stripPrefix("v")
            .stripSuffix(".json").stripSuffix(".tsv").toInt
          if (v < keepFrom) Files.delete(m)
        } finally sl.close()
      }
    }
    // 2. delete unreferenced data files and crashed-stage leftovers.
    val dataDir = Paths.get(table, "data")
    val dl = Files.list(dataDir)
    val removed =
      try dl.iterator().asScala.toSeq
        .filter(p => !live.contains(p.getFileName.toString))
        .map { p => Files.delete(p); p.getFileName.toString }
      finally dl.close()
    val tl = Files.list(Paths.get(table))
    try tl.iterator().asScala.toSeq
      .filter(p => p.getFileName.toString.startsWith("stage-"))
      .foreach { d =>
        val w = Files.walk(d)
        try w.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
        finally w.close()
      }
    finally tl.close()
    removed.sorted
  }
}
