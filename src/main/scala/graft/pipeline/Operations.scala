package graft.pipeline

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.{LakeTable, LakeWriter}

/** Port of the reference's application layer
  * (`includes/main/python/operations.py`, cited per-function) onto the
  * lake table format. Structure is one-to-one; the storage calls go to
  * [[graft.lake]] instead of delta. `clock` is injectable so tests can
  * freeze `current_timestamp` (SURVEY §7.9 determinism note).
  */
final class Operations(val clock: () => Timestamp = Operations.systemClock) {

  /** ops:63-65 — text scan of JSON-lines raw files, schema "value STRING". */
  def readBatchRaw(spark: SparkSession, rawPath: String): DataFrame =
    spark.read.format("text").schema("value STRING").load(rawPath)

  /** ops:137-144 — add ingestion metadata around the raw value. */
  def transformRaw(raw: DataFrame): DataFrame = {
    val now = lit(clock()).cast("timestamp")
    raw.select(
      lit("files.training.databricks.com").as("datasource"),
      now.as("ingesttime"),
      lit("new").as("status"),
      col("value"),
      now.cast("date").as("p_ingestdate"))
  }

  /** ops:23-36 — partitioned append (drop excluded cols) to a lake
    * path. `properties` apply only when the append creates the table.
    */
  def batchWriter(
      dataframe: DataFrame,
      partitionColumn: String,
      excludeColumns: Seq[String] = Nil,
      mode: String = "append",
      properties: Map[String, String] = Map.empty)(path: String): Unit = {
    LakeWriter.write(
      dataframe.drop(excludeColumns: _*),
      path, mode = mode, partitionBy = Seq(partitionColumn),
      properties = properties)
  }

  /** ops:52-53 — bronze rows awaiting processing. */
  def readBatchBronze(spark: SparkSession, bronzePath: String): DataFrame =
    LakeTable.forPath(spark, bronzePath).toDF.filter("status = 'new'")

  /** ops:70-107 — parse the raw JSON payload and type it for silver.
    * With `quarantine=true`, device_id stays STRING (uuid-bearing rows
    * survive the cast for later repair).
    */
  def transformBronze(bronze: DataFrame, quarantine: Boolean = false)
      : DataFrame = {
    val jsonSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "time TIMESTAMP, name STRING, device_id STRING, steps INTEGER, " +
      "day INTEGER, month INTEGER, hour INTEGER")
    val augmented = bronze.withColumn("nested_json",
      from_json(col("value"), jsonSchema))
    val flat = augmented.select(col("value"), col("nested_json.*"))
    // try_cast: uuid-valued device_ids become NULL (the quarantine
    // trigger, etl/02:397-398) instead of throwing under ANSI mode.
    if (!quarantine)
      flat.select(col("value"),
        col("device_id").try_cast("integer").as("device_id"),
        col("steps"),
        col("time").as("eventtime"),
        col("name"),
        col("time").cast("date").as("p_eventdate"))
    else
      flat.select(col("value"), col("device_id"), col("steps"),
        col("time").as("eventtime"), col("name"),
        col("time").cast("date").as("p_eventdate"))
  }

  /** ops:41-47 — split one typed plan into clean/quarantine branches. */
  def generateCleanAndQuarantine(df: DataFrame): (DataFrame, DataFrame) =
    (df.filter("device_id IS NOT NULL"), df.filter("device_id IS NULL"))

  /** ops:149-166 — bronze status state machine via MERGE on the raw
    * value (unique key, etl/02:250-252).
    */
  def updateBronzeTableStatus(
      spark: SparkSession, bronzePath: String,
      dataframe: DataFrame, status: String): Unit = {
    val augmented = dataframe.withColumn("status", lit(status))
    LakeTable.forPath(spark, bronzePath).as("bronze")
      .merge(augmented.as("dataframe"), "bronze.value = dataframe.value")
      .whenMatchedUpdate(Map("status" -> "dataframe.status"))
      .execute()
  }

  /** ops:112-132 — repair quarantined rows by joining the uuid-valued
    * device_id to the user dimension (J1). The dim side is tiny →
    * Catalyst broadcasts it.
    */
  def repairQuarantinedRecords(
      spark: SparkSession, bronzePath: String, userPath: String): DataFrame = {
    val quarantined = LakeTable.forPath(spark, bronzePath).toDF
      .filter("status = 'quarantined'")
    val transformed = transformBronze(quarantined, quarantine = true)
      .as("quarantine")
    val usersDF = LakeTable.forPath(spark, userPath).toDF.as("user")
    transformed
      .join(usersDF, col("quarantine.device_id") === col("user.user_id"))
      .select(
        col("quarantine.value").as("value"),
        col("user.device_id").cast("integer").as("device_id"),
        col("quarantine.steps").as("steps"),
        col("quarantine.eventtime").as("eventtime"),
        col("quarantine.name").as("name"),
        col("quarantine.eventtime").cast("date").as("p_eventdate"))
  }
}

object Operations {
  val systemClock: () => Timestamp =
    () => new Timestamp(System.currentTimeMillis())

  /** A frozen clock for deterministic tests. */
  def fixedClock(ts: String): () => Timestamp =
    () => Timestamp.valueOf(ts)
}
