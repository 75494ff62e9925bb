package graft
import org.apache.spark.sql.SparkSession
/** Scratch generator for the BPE delta-vs-recount measurement (PLANS.md
  * round 12): a documents table whose VOCABULARY is huge (~2M distinct
  * words of 1-6 base-36 chars, 200 words/doc) — the regime the
  * distributed merge loop exists for. Usage: GenHiVocab <outDir> <nWords>
  */
object GenHiVocab {
  def main(args: Array[String]): Unit = {
    val Array(out, nStr) = args
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(nStr.toLong).selectExpr(
        "id div 200 AS doc_id",
        "lower(conv((xxhash64(id) & 9223372036854775807) % 2176782336, 10, 36)) AS word")
      .groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.concat_ws(" ",
        org.apache.spark.sql.functions.collect_list("word")).as("text"))
      .coalesce(8)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    spark.stop()
  }
}
