package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed table layout — the PRE-SHUFFLED join: both tables are written
  * hash-partitioned into the same number of buckets on the join key
  * (Spark's `bucketBy`, hash = Murmur3 on the key, the same function the
  * shuffle would use), so a later equi join on that key needs NO exchange
  * on either side — the scan itself satisfies the join's distribution
  * requirement, bucket i joins bucket i.
  *
  * This is the third layout strategy in `sources/` and the only one aimed
  * at JOINS rather than scans: [[Compaction]] buys min/max file skipping
  * on one key, [[ZOrder]] on two, bucketing buys shuffle ELIMINATION —
  * at 100 TB the dominant cost of a fact⋈fact join is rewriting both
  * sides over the network, and a bucketed layout pays that cost ONCE at
  * write time, amortized over every subsequent join/aggregation on the
  * bucket key (the exact trade Hive/Spark warehouses run for their
  * biggest recurring joins; Iceberg models the same thing as a bucket
  * partition transform). `sortBy` inside buckets additionally lets the
  * sort-merge join skip its per-task sort when files-per-bucket is 1.
  *
  * Scope, honestly: bucket metadata lives in the session catalog (the
  * table must be registered in the session that reads it — production
  * puts this in a shared metastore/table format); both sides must agree
  * on bucket count and key, or Spark falls back to shuffling the
  * mismatched side. BucketingSpec pins the load-bearing claims: the
  * bucketed equi join plans with ZERO shuffle exchanges while the same
  * join over plain parquet exchanges both sides, and the results match
  * row-for-row.
  */
object Bucketing {

  /** Write `df` as an EXTERNAL bucketed table: `n` buckets on `cols`,
    * sorted by the same columns inside each bucket, data files under
    * `path`, catalog entry `name` in the current session.
    */
  def writeBucketed(df: DataFrame, name: String, path: String, n: Int,
      cols: String*): Unit = {
    require(cols.nonEmpty, "bucketing needs at least one column")
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(n, cols.head, cols.drop(1): _*)
      .sortBy(cols.head, cols.drop(1): _*)
      .saveAsTable(name)
  }
}
