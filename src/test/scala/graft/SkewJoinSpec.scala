package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cluster-readiness proof for the skew story: at 100 TB a single hot key
  * (one viral document, one dominant user) turns a hash join's partition
  * into a straggler. Two mitigations ship in this library and this spec
  * exercises both mechanically:
  *
  *  1. AQE skew-join splitting (`q_salted_wordcount` handles skewed AGGS
  *     via salting; JOINS get runtime splitting for free): a sort-merge
  *     join with one key carrying ~100× the rows must come out of AQE
  *     with `isSkew = true` sub-partitions — proving the config surface
  *     this library's sessions run under actually splits stragglers.
  *  2. The salting pattern itself (key ++ salt shard → partial agg →
  *     de-salt) — asserted equal to the unsalted truth.
  */
class SkewJoinSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  private lazy val spark = SparkTestBase.spark

  test("AQE splits a skewed sort-merge join at runtime") {
    import spark.implicits._
    val conf = spark.conf
    val prior = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // Thresholds scaled to a test-sized dataset: a partition is skewed
      // past 5× the median AND 64 KB, split toward 16 KB targets.
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "5")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // Force a sort-merge join: broadcast would hide the skew entirely.
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // The join output feeds a groupBy, so splitting adds a shuffle the
      // cost check would veto; force it — the straggler costs more than
      // the (already-present ENSURE_REQUIREMENTS) exchange.
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")

      // Left: 200k rows on the hot key 0, ~2k on each of 100 cold keys.
      // The md5 payload is INCOMPRESSIBLE and survives the join — map
      // output statistics report compressed sizes, and 200k identical
      // keys alone would LZ4 below any realistic skew threshold.
      val left = spark.range(0, 400000).select(
        when(col("id") < 200000, 0L).otherwise(col("id") % 100 + 1).as("k"),
        md5(col("id").cast("string")).as("pad"))
      val right = spark.range(0, 101).select(col("id").as("k"),
        concat(lit("dim-"), col("id")).as("name"))
      val joined = left.join(right, "k")
        .groupBy(col("name")).agg(count(lit(1)).as("n"), max(col("pad")).as("mp"))
      val rows = joined.collect()
      assert(rows.map(_.getLong(1)).sum == 400000L)

      // The executed adaptive plan must contain skew-split sub-partitions.
      val plan = joined.queryExecution.executedPlan
      val planStr = plan.toString
      assert(planStr.contains("isSkew=true") || planStr.contains("skew=true"),
        s"AQE did not mark/split the skewed partition:\n$planStr")
    } finally {
      prior.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None)    => conf.unset(k)
      }
    }
  }

  test("salted aggregation equals the unsalted truth on a hot key") {
    import spark.implicits._
    // 100k rows of one hot word + a cold tail; salt into 16 shards,
    // partial-agg per (word, salt), de-salt, compare to direct groupBy.
    val words = spark.range(0, 110000).select(
      when(col("id") < 100000, "hot").otherwise(concat(lit("w"), col("id") % 50))
        .as("word"))
    val salted = words
      .withColumn("salt", pmod(crc32(concat(col("word"), monotonically_increasing_id().cast("string"))), lit(16)))
      .groupBy(col("word"), col("salt")).agg(count(lit(1)).as("c"))
      .groupBy(col("word")).agg(sum(col("c")).as("n"))
    val truth = words.groupBy(col("word")).agg(count(lit(1)).as("n"))
    val a = salted.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = truth.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a("hot") == 100000L)
  }
}
