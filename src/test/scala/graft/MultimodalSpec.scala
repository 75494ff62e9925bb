package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  test("payload bytes and meta struct are consistent with the source") {
    val row = Multimodal.withPayload(docs)
      .select(col("doc_id"), length(col("payload")).as("pl"),
        col("meta.n_bytes"), col("meta.mime"))
      .collect()
    assert(row.nonEmpty)
    row.foreach(r => assert(r.getInt(1).toLong == r.getLong(2)))
    assert(row.forall(_.getString(3) == "image/fake"))
  }

  test("feature extraction is deterministic across partitionings") {
    val a = Multimodal.extractFeatures(spark, docs, batchSize = 64)
      .collect().sortBy(_.doc_id)
    val b = Multimodal.extractFeatures(spark, docs.repartition(7), batchSize = 3)
      .collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
    // ASCII corpus: byte length == char count; mean byte in letter range.
    a.foreach { f =>
      assert(f.channels == 3 && f.n_bytes > 0)
      assert(f.mean_byte > 32 && f.mean_byte < 127)
    }
  }
}
