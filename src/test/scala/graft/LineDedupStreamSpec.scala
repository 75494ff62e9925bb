package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams
import graft.streaming.Streams.{DocEvent, SegEvent}

/** lineDedupStream vs the batch boilerplate census: the set of PROMOTED
  * segments must equal the batch df >= 3 set exactly once the corpus has
  * streamed through — regardless of how the docs split across
  * micro-batches — and flagged-occurrence counts must obey the
  * stream-cannot-retract law (batch occurrences minus the threshold-1
  * unflagged early carriers per segment... exactly threshold-1 when
  * every occurrence is a distinct doc). RocksDB leg included.
  */
class LineDedupStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.01"
  private def ts(i: Int) = new Timestamp(1700000000000L + i * 1000L)

  private def loadDocs(): Seq[DocEvent] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().sortBy(_.getLong(0)).zipWithIndex
      .map { case (r, i) => DocEvent(r.getLong(0), ts(i), r.getString(1)) }
      .toSeq

  /** Brute-force truth over raw segment strings (the LineDedupSpec
    * reference): per segment, the ORDERED distinct doc list.
    */
  private def segDocs(): Map[String, Seq[Long]] = {
    val m = scala.collection.mutable.Map.empty[String,
      scala.collection.mutable.LinkedHashSet[Long]]
    for (d <- loadDocs().sortBy(_.doc_id)) {
      val ws = d.text.split(" ", -1)
      val segs = (0 until ws.length / 3)
        .map(i => ws.slice(i * 3, i * 3 + 3).mkString(" ")).distinct
      for (s <- segs)
        m.getOrElseUpdate(s, scala.collection.mutable.LinkedHashSet.empty) +=
          d.doc_id
    }
    m.view.mapValues(_.toSeq).toMap
  }

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def runStream(nBatches: Int): Seq[SegEvent] = {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val docs = loadDocs()
    val input = MemoryStream[DocEvent]
    val name = s"linededup_${System.nanoTime()}"
    val q = Streams.lineDedupStream(spark, input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      docs.grouped((docs.size + nBatches - 1) / nBatches)
        .foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(name).as[SegEvent].collect().toSeq
    } finally q.stop()
  }

  private def check(events: Seq[SegEvent]): Unit = {
    val truth = segDocs()
    val wantBoiler = truth.filter(_._2.size >= 3)
    val wantByDigest = wantBoiler.map { case (s, ds) => md5(s) -> ds }
    // Promoted set == batch boilerplate set, and the promoter is the
    // 3rd distinct carrier in doc_id order (batches split in id order).
    val promoted = events.filter(_.promoted).map(e => e.seg -> e.doc_id).toMap
    assert(promoted.keySet == wantByDigest.keySet,
      s"promoted sets differ: ${promoted.size} vs ${wantByDigest.size}")
    wantByDigest.foreach { case (digest, ds) =>
      assert(promoted(digest) == ds(2),
        s"promoter of $digest is ${promoted(digest)}, want ${ds(2)}")
    }
    // Flagged occurrences: everything past the threshold — the
    // cannot-retract law means exactly threshold-1 early carriers per
    // boilerplate segment are never flagged.
    val flagged = events.filterNot(_.promoted)
      .groupBy(_.seg).view.mapValues(_.map(_.doc_id).toSet).toMap
    wantByDigest.foreach { case (digest, ds) =>
      val wantFlagged = ds.drop(3).toSet
      assert(flagged.getOrElse(digest, Set.empty) == wantFlagged,
        s"flagged carriers of $digest differ")
    }
    assert(events.exists(!_.promoted), "no flagged occurrences — degenerate")
  }

  test("promoted set equals the batch boilerplate set (3 batches)") {
    check(runStream(3))
  }

  test("batch-split invariance: 7 batches give the same answer") {
    check(runStream(7))
  }

  test("RocksDB state store matches the default provider") {
    val keyConf = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(keyConf)
    spark.conf.set(keyConf,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try check(runStream(3))
    finally prev match {
      case Some(v) => spark.conf.set(keyConf, v)
      case None => spark.conf.unset(keyConf)
    }
  }
}
