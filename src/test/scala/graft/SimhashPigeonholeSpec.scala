package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The 4-chunk pigeonhole used by dedup_simhash_hamming is lossless: a
  * 64-bit pair within Hamming distance 3 differs in at most 3 of the 4
  * 16-bit chunks, so at least one chunk matches exactly and the pair lands
  * in that chunk's bucket. This spec proves the property empirically:
  * bucketed result == exhaustive all-pairs result (only computable at test
  * scale) — exactly, not approximately, in contrast to the probabilistic
  * MinHash/hyperplane recall probes.
  */
class SimhashPigeonholeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def check(dir: String): Unit = {
    val sig = Dedup.simhash64(spark, dir).localCheckpoint()
    val a = sig.select(col("doc_id").as("da"), col("simhash_lo").as("alo"),
      col("simhash_hi").as("ahi"))
    val b = sig.select(col("doc_id").as("db"), col("simhash_lo").as("blo"),
      col("simhash_hi").as("bhi"))
    val hamming = bit_count(col("alo").bitwiseXOR(col("blo"))) +
      bit_count(col("ahi").bitwiseXOR(col("bhi")))
    val exhaustive = a.join(b, col("da") < col("db"))
      .filter(hamming <= 3)
      .select(col("da"), col("db"), hamming.cast("long").as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bucketed = graft.SparkEntry.queries("dedup_simhash_hamming")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    info(s"$dir: ${bucketed.size} pairs within Hamming 3")
    assert(bucketed == exhaustive,
      s"missing=${(exhaustive -- bucketed).take(5)} extra=${(bucketed -- exhaustive).take(5)}")
    assert(bucketed.nonEmpty, "no near-dup pairs found — probe is vacuous")
  }

  test("bucketed Hamming<=3 pairs equal the exhaustive result at sf0.001") {
    check("/root/testdata/sf0.001")
  }

  test("bucketed Hamming<=3 pairs equal the exhaustive result at sf0.01") {
    check("/root/testdata/sf0.01")
  }
}
