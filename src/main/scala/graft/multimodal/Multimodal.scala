package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed in partition-local batches.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic fake ([[FakeCodec]]) — but everything
  * Spark-side is real and load-bearing: the binary column, the metadata
  * struct schema, the batched `mapPartitions` shape (fixed-size batches ≅
  * Arrow record batches, so a real codec drops in without changing the
  * plan), and the partitioning story (payload bytes never shuffle — feature
  * extraction runs before any wide operator, and only the small typed
  * features flow on).
  */
object Multimodal {

  /** Decoded-media features; a real decoder would fill these from pixels. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Long,
      height: Long, channels: Long, mean_byte: Double)

  /** STUB CODEC — deterministic fake standing in for image/audio decode
    * (no codec libraries in this container). Geometry derives from the
    * payload length, `mean_byte` from the real bytes, so results are
    * reproducible and partition-order-independent.
    */
  object FakeCodec {
    def decode(docId: Long, payload: Array[Byte]): MediaFeatures = {
      val n = payload.length.toLong
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
      MediaFeatures(docId, n,
        width = n % 640, height = n / 640 + 1, channels = 3,
        mean_byte = if (n == 0) 0.0 else sum.toDouble / n)
    }
  }

  /** Attach a binary payload + metadata struct to the documents table —
    * the ingestion shape for media: `(doc_id, payload binary, meta struct)`.
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("image/fake").as("mime"),
        col("source").as("origin"),
        expr("octet_length(text)").cast("long").as("n_bytes")).as("meta"))

  /** Batched feature extraction over the payload column: partition-local,
    * `batchSize` records per codec call — the `mapInPandas`/Arrow batch
    * contract expressed in Scala. The payload never leaves the partition.
    */
  def extractFeatures(spark: SparkSession, docs: DataFrame,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    withPayload(docs)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) => FakeCodec.decode(id, bytes) }
        }
      }
  }
}
