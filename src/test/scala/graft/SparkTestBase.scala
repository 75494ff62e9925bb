package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (getOrCreate dedups). */
object SparkTestBase {
  /** Repeat-suite stress knobs (the test-mr-many.sh analog; reference
    * `src/main/test-mr-many.sh:15-23` reruns its whole suite N times for
    * flakiness). `tools/stress.sh` drives N sbt trials, varying the
    * shuffle-partition count per trial and offsetting every suite-local
    * RNG seed — same assertions, different schedules/layouts each trial.
    */
  val stressSeed: Int =
    sys.env.get("SPARK_GRAFT_STRESS_SEED").flatMap(_.toIntOption).getOrElse(0)
  private val stressPartitions: String =
    sys.env.get("SPARK_GRAFT_STRESS_PARTITIONS")
      .flatMap(_.toIntOption).map(_.toString).getOrElse("8")

  // local[4,2]: 4 threads, maxFailures=2 — lets CrashRecoverySpec inject a
  // first-attempt task failure (the reference's crash suite, E11) without
  // failing the job; harmless for every other suite.
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4,2]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", stressPartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Sessions.quietBoundedWindowWarn()
    s
  }
}
