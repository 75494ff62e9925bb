package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams
import graft.streaming.Streams.{AssembledSample, ShardEntry}

/** The streaming sample-assembly operator: out-of-order cross-batch part
  * arrival, duplicate-delivery idempotence, orphan TTL to an explicit
  * DLQ row, and state freed the moment a sample completes.
  */
class SampleAssemblySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def ts(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)

  private def run(batches: Seq[Seq[ShardEntry]], ttlSeconds: Long = 600,
      watermarkDelay: String = "10 minutes"): Seq[AssembledSample] = {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[ShardEntry]
    val q = Streams.sampleAssemblyStream(spark, input.toDS(),
      orphanTtlSeconds = ttlSeconds, watermarkDelay = watermarkDelay)
      .writeStream.format("memory").queryName("assembly")
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        input.addData(b: _*)
        q.processAllAvailable()
      }
      spark.table("assembly").as[AssembledSample].collect().toSeq
    } finally q.stop()
  }

  test("parts split across batches in adversarial order assemble once") {
    val out = run(Seq(
      // json before txt, two samples interleaved
      Seq(ShardEntry("doc1", "json", ts(0), 30),
        ShardEntry("doc2", "txt", ts(0), 500)),
      Seq(ShardEntry("doc2", "json", ts(1), 31),
        ShardEntry("doc1", "txt", ts(1), 400))))
    assert(out.toSet == Set(
      AssembledSample("doc1", complete = true, 2, 400, 30, ""),
      AssembledSample("doc2", complete = true, 2, 500, 31, "")))
  }

  test("arrival order across batches does not change the assembled rows") {
    val entries = Seq(
      ShardEntry("a", "txt", ts(0), 100), ShardEntry("a", "json", ts(1), 10),
      ShardEntry("b", "txt", ts(0), 200), ShardEntry("b", "json", ts(1), 20),
      ShardEntry("c", "txt", ts(1), 300), ShardEntry("c", "json", ts(0), 30))
    val o1 = run(Seq(entries)).toSet
    val o2 = run(entries.reverse.map(Seq(_))).toSet // one per micro-batch
    val o3 = run(Seq(entries.take(3), entries.drop(3))).toSet
    assert(o1 == o2 && o2 == o3)
    assert(o1.forall(_.complete) && o1.size == 3)
  }

  test("duplicate deliveries are idempotent (first part occurrence wins)") {
    val out = run(Seq(
      Seq(ShardEntry("d", "txt", ts(0), 700),
        ShardEntry("d", "txt", ts(0), 700)), // same-batch duplicate
      Seq(ShardEntry("d", "txt", ts(1), 700)), // cross-batch re-delivery
      Seq(ShardEntry("d", "json", ts(2), 44))))
    assert(out == Seq(AssembledSample("d", complete = true, 2, 700, 44, "")))
  }

  test("orphans evict at the TTL as explicit incomplete rows") {
    val out = run(Seq(
      Seq(ShardEntry("lost", "txt", ts(0), 123),
        ShardEntry("ok", "txt", ts(0), 50),
        ShardEntry("ok", "json", ts(0), 5)),
      // Advance the watermark far past the TTL; 'lost' must surface as a
      // DLQ row naming its missing part, never a silent drop.
      Seq(ShardEntry("late", "txt", ts(60), 1),
        ShardEntry("late", "json", ts(60), 2))),
      ttlSeconds = 60, watermarkDelay = "0 seconds")
    val lost = out.find(_.sample_key == "lost").get
    assert(!lost.complete && lost.missing == "json")
    assert(lost.txt_bytes == 123 && lost.meta_bytes == -1)
    assert(out.find(_.sample_key == "ok").get.complete)
    assert(out.find(_.sample_key == "late").get.complete)
  }

  test("matches the batch grouping truth on a seeded entry cloud") {
    val rnd = new scala.util.Random(7)
    val keys = (0 until 40).map(i => s"s$i")
    // ~15% of samples lose their json part.
    val entries = keys.flatMap { k =>
      val txt = ShardEntry(k, "txt", ts(rnd.nextInt(5)), 100 + k.length)
      if (rnd.nextInt(100) < 15) Seq(txt)
      else Seq(txt, ShardEntry(k, "json", ts(rnd.nextInt(5)), 10 + k.length))
    }
    val shuffled = rnd.shuffle(entries)
    val cuts = shuffled.grouped(7).toSeq :+
      Seq(ShardEntry("advance", "txt", ts(300), 1),
        ShardEntry("advance", "json", ts(300), 1))
    val out = run(cuts, ttlSeconds = 60)
    val byKey = entries.groupBy(_.sample_key)
    byKey.foreach { case (k, es) =>
      val got = out.find(_.sample_key == k).get
      val complete = es.map(_.part).toSet == Set("txt", "json")
      assert(got.complete == complete, s"$k completeness")
      assert(got.txt_bytes == es.find(_.part == "txt").get.n_bytes, k)
      if (complete)
        assert(got.meta_bytes == es.find(_.part == "json").get.n_bytes, k)
      else assert(got.missing == "json", k)
    }
  }
}
