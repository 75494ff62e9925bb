package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal plumbing as a declared operator: binary payload ingestion +
  * batched stub decode (see graft.multimodal.Multimodal — the codec is a
  * deterministic fake, the Spark plumbing is real). The oracle recomputes
  * the fake's closed form from the payload bytes.
  */
object MultimodalOps {
  import Tables.t

  val decodeStub = Q(
    "mm_decode_stub",
    "Binary media pipeline: text bytes as the stand-in payload, batched " +
      "mapPartitions feature extraction (64-record batches ≅ Arrow), typed " +
      "feature schema out. Payload bytes never shuffle — only the small " +
      "features leave the scan stage.",
    Some("""
      SELECT doc_id,
             octet_length(encode(text))::BIGINT AS n_bytes,
             (octet_length(encode(text)) % 640)::BIGINT AS width,
             (octet_length(encode(text)) // 640 + 1)::BIGINT AS height,
             3::BIGINT AS channels
      FROM documents""".stripMargin),
    (spark, dir) =>
      Multimodal.extractFeatures(spark, t(spark, dir, "documents"))
        .toDF()
        .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
          col("channels")))

  val all: Seq[Q] = Seq(decodeStub)
}
