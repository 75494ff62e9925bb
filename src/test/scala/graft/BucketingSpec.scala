package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing — the co-located-join contract at 100 TB: writing both join
  * sides bucketed by the join key lets the sort-merge join read
  * bucket-aligned files with NO shuffle exchange at query time. A fact
  * table joined every day against another fact pays the shuffle once at
  * write time instead of per query. This spec proves the engine's tables
  * round-trip through bucketed storage and that the bucketed join plan is
  * exchange-free where the unbucketed one shuffles both sides.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("bucketed-by-key tables join without a shuffle exchange") {
    val loc = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '$loc'")
    try {
      val orders = graft.queries.Tables.t(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val lineitem = graft.queries.Tables.t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
      orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("bucketdb.orders_b")
      lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("bucketdb.lineitem_b")

      val joined = spark.table("bucketdb.orders_b")
        .join(spark.table("bucketdb.lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
      val rows = joined.count()
      assert(rows == orders.join(lineitem,
        col("o_orderkey") === col("l_orderkey")).count())

      // The bucketed plan must be exchange-free (bucket-aligned SMJ);
      // disable auto-broadcast so the small test tables don't sidestep
      // the comparison, and AQE so the pre-execution plan is inspectable.
      val broadcastKey = "spark.sql.autoBroadcastJoinThreshold"
      val aqeKey = "spark.sql.adaptive.enabled"
      val prevB = spark.conf.get(broadcastKey)
      val prevA = spark.conf.get(aqeKey)
      spark.conf.set(broadcastKey, "-1")
      spark.conf.set(aqeKey, "false")
      try {
        val bucketedPlan = spark.table("bucketdb.orders_b")
          .join(spark.table("bucketdb.lineitem_b"),
            col("o_orderkey") === col("l_orderkey"))
          .queryExecution.executedPlan.toString
        assert(!bucketedPlan.contains("Exchange"),
          s"bucketed join still shuffles:\n$bucketedPlan")
        val unbucketedPlan = orders
          .join(lineitem, col("o_orderkey") === col("l_orderkey"))
          .queryExecution.executedPlan.toString
        assert(unbucketedPlan.contains("Exchange"),
          "control: the unbucketed join should shuffle")
      } finally {
        spark.conf.set(broadcastKey, prevB)
        spark.conf.set(aqeKey, prevA)
      }
    } finally {
      spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")
    }
  }
}
