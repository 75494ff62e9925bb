package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator/query from SURVEY.md §2's inventory: the Spark
  * formulation plus (when SQL-expressible) the equivalent DuckDB oracle SQL
  * the driver runs over the same parquet tables. Column names/types must match
  * between the two — the driver's compare sorts columns by name and hashes
  * values.
  *
  * Determinism rules used throughout:
  *  - every double aggregate is `round(..., k)` on BOTH sides, so engine
  *    summation-order differences (~1e-12 relative) can't flip the hash;
  *  - every top-k / window rank orders by the ROUNDED measure with an id
  *    tie-break, so near-equal measures rank identically on both engines;
  *  - timestamps never appear raw in output — always `epoch` bigints or
  *    formatted strings — avoiding tz/precision representation mismatches;
  *  - DuckDB integer sums are cast `::BIGINT` (its SUM(int) is HUGEINT).
  */
final case class Q(
    name: String,
    doc: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

object Q {
  /** Materialize a subtree that downstream operators reference more than
    * once (shingle explosions, normalized vectors), with a config-driven
    * strategy — `spark.graft.materialize`:
    *
    *  - `localCheckpoint` (default): eager, executor-local, query-scoped,
    *    cleaner-managed — the right call on local[*] and the Verify/Bench
    *    sweeps. NOT replicated: on a multi-node cluster losing an executor
    *    kills the query instead of recomputing.
    *  - `checkpoint`: reliable checkpoint to `spark.graft.checkpointDir`
    *    (HDFS/object store on a cluster) — survives executor loss; the
    *    cluster-production setting.
    *  - `persist`: MEMORY_AND_DISK cache — recomputable lineage is kept, so
    *    executor loss recovers; entries live in the session CacheManager
    *    until `spark.catalog.clearCache()` (acceptable for long-lived
    *    cluster jobs, wrong for many-query sweeps — hence not the default).
    *  - `none`: pass-through (forces Catalyst to re-evaluate the subtree
    *    everywhere it is referenced; only for plan-shape debugging).
    */
  def materialize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.get("spark.graft.materialize", "localCheckpoint") match {
      case "localCheckpoint" => df.localCheckpoint(eager = true, level(spark))
      case "checkpoint" =>
        if (spark.sparkContext.getCheckpointDir.isEmpty)
          spark.sparkContext.setCheckpointDir(
            spark.conf.get("spark.graft.checkpointDir"))
        df.checkpoint()
      case "persist" =>
        df.persist(level(spark))
      case "none" => df
      case other => throw new IllegalArgumentException(
        s"spark.graft.materialize: unknown strategy '$other'")
    }
  }

  /** Storage level for the cache-backed strategies (`localCheckpoint`,
    * `persist`) — `spark.graft.materialize.level`:
    *
    *  - `mem_disk_ser` (default): serialized blocks. UnsafeRow bytes are
    *    packed into one buffer per partition (Externalizable write of the
    *    row's backing bytes — no per-row object graph), and BOTH the
    *    in-memory and disk forms route through the block codec when
    *    `spark.rdd.compress=true`. This is the level that survives
    *    |E|-scale frames: the round-12 g100 pagerank DNF matrix showed
    *    the deserialized default's TWO failure terms — disk overflow
    *    written uncompressed regardless of the shuffle codec (killed the
    *    plain and zstd-shuffle legs at ~73 GB), and with `rdd.compress`
    *    forced, the heap term of 32 concurrent tasks' buffers on top of
    *    a window of deserialized cached partitions (exit 52 in the same
    *    stage). Serialized blocks remove both: compact bytes in memory,
    *    codec-wrapped bytes on disk.
    *  - `mem_disk`: the pre-round-13 deserialized MEMORY_AND_DISK —
    *    skips per-read deserialization, right when every cached frame
    *    fits in executor memory with headroom (small-SF sweeps never
    *    notice either way; kept as the measured fallback posture).
    */
  def level(spark: SparkSession): org.apache.spark.storage.StorageLevel =
    spark.conf.get("spark.graft.materialize.level", "mem_disk_ser") match {
      case "mem_disk_ser" =>
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
      case "mem_disk" =>
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      case other => throw new IllegalArgumentException(
        s"spark.graft.materialize.level: unknown level '$other'")
    }

  /** Materialization for ITERATIVE-loop bodies: same strategy switch as
    * [[materialize]], except the result must always CUT lineage — a
    * convergence loop whose rounds self-join re-doubles the logical
    * subtree every iteration, so a lineage-keeping strategy (`persist`,
    * `none`) would hand the optimizer an exponentially growing plan (and
    * make executor-loss recovery recompute the whole iteration history).
    * `persist` and `none` therefore fall back to `localCheckpoint` here;
    * on a real cluster the `checkpoint` strategy is the fault-tolerant
    * loop setting (reliable files, lineage cut).
    */
  def materializeLoop(df: DataFrame): DataFrame =
    df.sparkSession.conf.get("spark.graft.materialize", "localCheckpoint") match {
      case "checkpoint" => materialize(df)
      case _ => df.localCheckpoint(eager = true, level(df.sparkSession))
    }
}

object Det {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{lit, round}

  /** Epsilon-shifted 2-decimal rounding. Spark rounds doubles HALF_UP on the
    * decimal string; DuckDB rounds on the binary double — they disagree
    * exactly on `.xx5` boundaries (e.g. avg of cent-valued prices). The
    * +1e-6 shift (≫ engine float noise ~1e-9, ≪ data granularity 0.005)
    * pushes every boundary case to round the same way on both engines. The
    * oracle SQL applies the identical shift.
    */
  def r2e(c: Column): Column = round(c + lit(1e-6), 2)

  /** Same for 4 decimals (similarity scores; boundary 5e-5 vs shift 1e-8). */
  def r4e(c: Column): Column = round(c + lit(1e-8), 4)
}

object Tables {
  /** Every testdata table (TESTDATA.md). Single source of truth for the
    * Sql CLI's view registration and Bench's warmup scan — a table added
    * here is automatically warmed/registered everywhere.
    */
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** [[t]] routed through a deployment-adaptive fan-out for the
    * EXPANSION/COMPUTE-HEAVY consumers (round 13, guide §2.5 "input
    * skew"): a table whose consumer does far more work per input byte
    * than the scan itself (suffix/shingle explosion, per-row regex or
    * codec decode, vector flops) must not inherit its parallelism from
    * INPUT BYTES — a single-row-group parquet file is one split no
    * matter how small `maxPartitionBytes` goes, so at the bench SFs the
    * downstream map stage ran as ONE task while 31 cores idled
    * (measured: substringCensus 7.96 → 3.05 s min-of-3 from
    * repartition(32) alone; jstack showed 31/32 executor threads parked
    * through the explode+substring stage). When the table supplies
    * fewer natural splits than the machine has cores, one exchange of
    * the raw (pre-explosion — the cheapest the query will ever touch)
    * bytes spreads the work; at scale, where inputs arrive as thousands
    * of splits, this is a PASS-THROUGH with zero added exchange.
    * Round-robin repartition is deterministic under retries
    * (sortBeforeRepartition, SPARK-23207).
    *
    * The split estimate is size-based (one FileSystem metadata call —
    * not `.rdd` planning, measured ~0.13 s per call, too dear for light
    * queries) and CONSERVATIVE: a large single-row-group file counts as
    * size/splitBytes even though Spark can't actually split it, so
    * mid-scale single-file layouts may under-fan; multi-file layouts
    * are estimated exactly (modulo open-cost padding, which only raises
    * the true split count further toward pass-through).
    */
  def fanned(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = t(spark, dir, name)
    val target = spark.sparkContext.defaultParallelism
    val bytes =
      try {
        val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .getContentSummary(p).getLength
      } catch { case _: Throwable => Long.MaxValue } // unknown: assume wide
    val splitBytes = org.apache.spark.network.util.JavaUtils
      .byteStringAsBytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    val naturalSplits = math.max(1L, (bytes + splitBytes - 1) / splitBytes)
    if (naturalSplits >= target) df else df.repartition(target)
  }

  /** All tables ship as single parquet files per TESTDATA.md.
    *
    * Deliberately BARE scans (round 13): an A/B sweep that routed the
    * corpus tables through [[Q.fanout]] here showed the per-scan
    * overhead (one extra exchange ≈ 0.1 s + `.rdd` planning ≈ 0.13 s,
    * measured) regressing every sub-second consumer while only the
    * expansion-heavy ones won — fan-out is applied at those call sites
    * instead, where the builder knows work-per-input-byte is large.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` normalization — the driver's generator has shipped this
    * column in different physical shapes across rounds, and every query
    * assumes one logical type (session-tz TIMESTAMP, castable to double
    * seconds):
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it outright.
    *    Read nanos as long (legacy conf) and convert with integer `div` —
    *    NOT `/`, which would round-trip the int64 nanos through a double
    *    and lose sub-second precision.
    *  - TIMESTAMP(MICROS) without tz metadata (pandas-written): Spark
    *    reads TIMESTAMP_NTZ, which Spark 4 refuses to cast to double.
    *    Cast to session-tz TIMESTAMP — the session is pinned UTC
    *    everywhere (Sessions/Verify/Bench), so the wall-clock value is
    *    preserved and matches DuckDB's naive-as-UTC `epoch()` reading.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
}
