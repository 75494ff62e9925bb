package graft

/** Session-level logging posture shared by every entry point (Verify,
  * Bench, the CLIs, the test base).
  */
object Sessions {

  /** Silence WindowExec's "No Partition Defined" WARN.
    *
    * Exactly four declared queries run a global window ON PURPOSE, each
    * over a pre-bounded input: ta_cms_topk (rank over a 10-row
    * TakeOrderedAndProject head), ta_zipf_fit (rank over a 1000-row
    * head), q_quantile_sketch and q_quantile_merge (cumulative walks
    * over ≤1024-bucket histogram aggregates). The single partition the
    * warning fears holds
    * k rows, never the data — but in a log review the line is
    * indistinguishable from a real scale-killer, so it goes. A literal
    * partition key cannot do this job: Catalyst's
    * EliminateWindowPartitions strips foldable keys before execution.
    * The boundedness itself is locked mechanically by PlanShapeSpec:
    * "global windows only ever run over bounded inputs" pins the
    * bounding operator in each of the four plans, and the every-query
    * sweep in "no all-pairs product..." fails ANY other declared query
    * that grows an unpartitioned window — so this suppression cannot
    * hide an unbounded global window regression anywhere on the
    * declared surface.
    */
  def quietBoundedWindowWarn(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
}
