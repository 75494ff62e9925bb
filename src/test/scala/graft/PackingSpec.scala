package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** pipeline_pack_sequences differential test: the distributed shard-local
  * packing census must match a sequential recomputation that literally
  * lays tokens out end to end per source, and the census must satisfy the
  * packing invariants (padding < one sequence per shard; boundary-doc
  * count consistent with a direct layout simulation).
  */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  // sf0.01: at the smoke SF few docs cross a boundary, so the
  // boundary-crossing branch would go untested (the DeterminismSpec
  // sfCaps rationale).
  private val dir = "/root/testdata/sf0.01"
  private val L = 512L

  test("distributed packing census matches the sequential layout") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), col("doc_id").cast("long"), col("text"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getString(2).split(" ").count(_.nonEmpty).toLong))
    val want = docs.groupBy(_._1).map { case (src, ds) =>
      var off = 0L
      var boundary = 0L
      var total = 0L
      for ((_, _, n) <- ds.sortBy(_._2)) {
        if (n > 0 && off / L != (off + n - 1) / L) boundary += 1
        off += n
        total += n
      }
      val nSeq = (total + L - 1) / L
      (src, ds.length.toLong, total, nSeq, nSeq * L - total, boundary)
    }.toSet
    val got = SparkEntry.queries("pipeline_pack_sequences")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == want,
      s"packing census differs\n got-want: ${(got diff want).take(3)}\n want-got: ${(want diff got).take(3)}")
    // Invariants: padding strictly under one sequence; at least one shard
    // actually straddles a boundary (the census is non-degenerate).
    assert(got.forall { case (_, _, _, _, pad, _) => pad >= 0 && pad < L })
    assert(got.exists(_._6 > 0), "no shard ever crossed a sequence boundary")
    // Token conservation: sequences always cover the tokens exactly.
    assert(got.forall { case (_, _, tot, nSeq, pad, _) => nSeq * L == tot + pad })
  }
}
