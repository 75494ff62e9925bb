package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RollingHash31

/** The native rolling-hash expression must equal the higher-order-function
  * formulation it replaced (aggregate over ascii(substr(...)) — the
  * round-1 implementation, kept here as the differential oracle) on real
  * data and unicode edge cases.
  */
class RollingHashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val hof = expr("aggregate(transform(sequence(1, length(s)), " +
    "i -> ascii(substr(s, i, 1))), 0L, " +
    "(acc, c) -> (acc * 31 + c) & 2147483647)")

  test("native expression equals HOF fold on edge cases") {
    import spark.implicits._
    val cases = Seq("", "a", "abc", "hello world",
      "café", "über", "你好世界",
      "mixed é中 a1!", "😀 emoji")  // incl. surrogate pair
    val rows = cases.toDF("s")
      .select(col("s"), RollingHash31(col("s")).as("native"), hof.as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"mismatch for '${r.getString(0)}'")
    }
  }

  test("native expression equals HOF fold on the documents table") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text").as("s"))
      .select(RollingHash31(col("s")).as("native"), hof.as("ref"))
      .filter(col("native") =!= col("ref"))
    assert(docs.count() == 0)
  }
}
