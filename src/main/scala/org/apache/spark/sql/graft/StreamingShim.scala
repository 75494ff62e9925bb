package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** The ONE private[sql] reach this repo makes, and why it is load-bearing:
  * a V1 streaming `Source.getBatch` must return a DataFrame whose logical
  * plan is tagged `isStreaming = true` (MicroBatchExecution asserts it),
  * and the only constructor for such a frame from an arbitrary plan is
  * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)` —
  * private[sql]. Every community V1 connector (the pattern this follows)
  * hosts exactly this shim in an `org.apache.spark.sql` subpackage; the
  * V2 escape hatch (MicroBatchStream) would instead require hand-rolling
  * a parquet PartitionReader, re-implementing what the batch reader
  * already does. Scope is kept minimal: one method, no other internals.
  */
object StreamingShim {
  def asStreamingFrame(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)
}
