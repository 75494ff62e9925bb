package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.multimodal.Multimodal

/** The visual twin of SimhashPigeonholeSpec: mm_phash_hamming's 4-chunk
  * pigeonhole over the 64-bit image blockhash is lossless for Hamming ≤ 3
  * — a pair differing in at most 3 bits differs in at most 3 of the 4
  * 16-bit chunks, so at least one chunk matches exactly and the pair lands
  * in that chunk's bucket. Proven empirically: bucketed result ==
  * exhaustive all-pairs result (computable only at test scale).
  */
class MmPhashPigeonholeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def check(dir: String): Unit = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val ph = Multimodal.phashes64(spark, docs).toDF("doc_id", "phash")
      .localCheckpoint()
    val a = ph.select(col("doc_id").as("da"), col("phash").as("pa"))
    val b = ph.select(col("doc_id").as("db"), col("phash").as("pb"))
    val hamming = bit_count(col("pa").bitwiseXOR(col("pb")))
    val exhaustive = a.join(b, col("da") < col("db"))
      .filter(hamming <= 3)
      .select(col("da"), col("db"), hamming.cast("long").as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bucketed = graft.SparkEntry.queries("mm_phash_hamming")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    info(s"$dir: ${bucketed.size} image pairs within Hamming 3")
    assert(bucketed == exhaustive,
      s"missing=${(exhaustive -- bucketed).take(5)} extra=${(bucketed -- exhaustive).take(5)}")
    assert(bucketed.nonEmpty, "no near-dup pairs found — probe is vacuous")
  }

  test("bucketed image Hamming<=3 pairs equal the exhaustive result at sf0.001") {
    check("/root/testdata/sf0.001")
  }

  test("bucketed image Hamming<=3 pairs equal the exhaustive result at sf0.01") {
    check("/root/testdata/sf0.01")
  }
}
