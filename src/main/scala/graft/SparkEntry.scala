package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is declared in [[queries]];
  * those with an ANSI-SQL-expressible semantics also appear in [[oracleSql]]
  * (DuckDB-checked at sf0.01 by the driver). Column names and types are
  * aligned pairwise — see `graft.queries.Q` for the determinism rules.
  */
object SparkEntry {

  private def modules: Seq[Q] =
    Relational.all ++ TpchDeck.all ++ EventsOps.all ++ TextOps.all ++ CorpusOps.all ++
      Dedup.all ++ Similarity.all ++ EngineOps.all ++ MultimodalOps.all ++
      GraphOps.all ++ Extras.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q5.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    modules.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
