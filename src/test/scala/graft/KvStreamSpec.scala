package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.state._

/** The streaming face (S1/S2 as mapGroupsWithState): state persists across
  * micro-batches — versions continue, stale puts keep rejecting.
  */
class KvStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("state persists across micro-batches") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[KvOp]
    val q = KvStream.pipeline(spark, input.toDS())
      .writeStream.format("memory").queryName("kvout")
      .outputMode("update").start()
    try {
      input.addData(KvOp("a", "v1", 0, seq = 1), KvOp("a", "v2", 1, seq = 2),
        KvOp("b", "x", 0, seq = 3))
      q.processAllAvailable()
      val batch1 = spark.table("kvout").as[KvResult].collect()
        .map(r => r.key -> r).toMap
      assert(batch1("a").version == 2 && batch1("a").value == "v2")
      assert(batch1("b").version == 1)

      // Second batch: version continues from stored state; stale op rejected.
      input.addData(KvOp("a", "v3", 2, seq = 4), KvOp("a", "stale", 0, seq = 5),
        KvOp("b", "y", 7, seq = 6))
      q.processAllAvailable()
      val rows2 = spark.table("kvout").as[KvResult].collect()
      val a2 = rows2.filter(_.key == "a").maxBy(_.version)
      assert(a2.version == 3 && a2.value == "v3" && a2.nRejected == 1)
      // y@7 rejected against stored state (version stays 1, value kept)
      assert(rows2.exists(r =>
        r.key == "b" && r.version == 1 && r.value == "x" && r.nRejected == 1))
    } finally q.stop()
  }
}
