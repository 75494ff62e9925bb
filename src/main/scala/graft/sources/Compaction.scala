package graft.sources

import org.apache.spark.sql.{Column, DataFrame}

/** Small-files compaction + data layout — the table-maintenance operator
  * every large parquet deployment runs (the reference has no file-layout
  * surface at all; this is pure 100 TB readiness): ingestion and
  * streaming sinks produce thousands of KB-scale files, and the fix is a
  * periodic rewrite into `n` range-partitioned files, each sorted on the
  * layout key.
  *
  * Why range + sort rather than plain `coalesce(n)`:
  *  - `repartitionByRange` gives files with DISJOINT key ranges, so every
  *    parquet footer's min/max statistics become selective — a reader's
  *    key-range predicate skips whole files'/row-groups' worth of data
  *    (coalesce leaves each output file spanning the full key range,
  *    making min/max useless);
  *  - `sortWithinPartitions` makes row-group-level min/max monotone
  *    inside each file, so even intra-file skipping works, and
  *    run-length/dictionary encodings compress the sorted key column;
  *  - the range exchange samples the key distribution, so skewed keys
  *    still yield balanced file sizes (the knob a fixed hash-mod split
  *    lacks).
  *
  * LayoutSpec proves the contract: exactly n files, disjoint key ranges
  * across files, monotone order within each file.
  */
object Compaction {

  /** The compaction plan: `n` range partitions on `cols`, rows sorted by
    * `cols` within each — callers `.write.parquet(...)` it (kept separate
    * from the write so tests and callers can also inspect the plan).
    */
  def compactToRange(df: DataFrame, n: Int, cols: Column*): DataFrame =
    df.repartitionByRange(n, cols: _*).sortWithinPartitions(cols: _*)

  /** Rewrite `df` at `path` as `n` range-partitioned, internally-sorted
    * parquet files.
    */
  def write(df: DataFrame, path: String, n: Int, cols: Column*): Unit =
    compactToRange(df, n, cols: _*).write.mode("overwrite").parquet(path)
}
