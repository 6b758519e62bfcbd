package org.apache.spark.sql.classic.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
import org.apache.spark.sql.types.StructType

/** The one bridge this engine needs into `private[sql]` Spark: v1
  * streaming `Source.getBatch` MUST return a DataFrame with
  * `isStreaming = true` (MicroBatchExecution asserts it), and the only
  * constructor for such a frame is
  * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)`.
  * Every V1-based lakehouse connector crosses this line the same way —
  * delta-spark compiles its whole source tree into
  * `org.apache.spark.sql.delta` for exactly this access — so the shim
  * is kept to a single, documented entry point rather than spreading
  * package-private access through the codebase.
  */
object StreamingShim {

  /** A streaming-tagged DataFrame over already-planned internal rows. */
  def streamingDataFrame(
      spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[ClassicSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** Re-plan a micro-batch DataFrame handed to a v1 `Sink.addBatch`
    * as a normal batch frame (the incoming frame is bound to the
    * streaming incremental execution and rejects batch writers).
    */
  def batchDataFrame(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[ClassicSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
