package graft.lake

import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType, TimestampType}

/** The change-data-feed column contract (Delta CDF parity:
  * `_change_type`, `_commit_version`, `_commit_timestamp`), shared by
  * batch [[LakeTable.changes]], the streaming source's declared
  * schema, and the DataSource relation schema — one definition, so
  * the relation schema and the micro-batch schema can never drift.
  */
object Cdf {
  val CHANGE_TYPE = "_change_type"
  val COMMIT_VERSION = "_commit_version"
  val COMMIT_TIMESTAMP = "_commit_timestamp"

  /** A table's change-feed schema: its data columns + the three audit
    * columns, in that fixed order.
    */
  def schema(base: StructType): StructType =
    StructType(base.fields ++ Seq(
      StructField(CHANGE_TYPE, StringType),
      StructField(COMMIT_VERSION, LongType),
      StructField(COMMIT_TIMESTAMP, TimestampType)))
}
