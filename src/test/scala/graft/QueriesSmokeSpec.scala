package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query runs at the smoke SF with rows > 0 (the driver's t1
  * check) and a stable column set; oracle keys ⊆ query keys. Full value
  * correctness is the DuckDB gate (tools/check_oracle.py / driver t2).
  */
class QueriesSmokeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle without query: $extra")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name: runs with rows > 0 at sf0.001") {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }
}
