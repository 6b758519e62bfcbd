package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.lake.{LakeCatalog, LakeSql, LakeTable}

/** Port of `05_compliance.py` — the GDPR/CCPA right-to-be-forgotten
  * flow over the medallion tables, driven through the SQL surface
  * exactly like the reference: RLIKE MERGE-delete on bronze raw values,
  * device-level deletes on silver/user via a deletion_users view,
  * time-travel audit, selective rollback, and guarded VACUUM.
  */
final class Compliance(
    bronzePath: String, silverPath: String, userPath: String) {

  /** Register the medallion tables under the reference's names. */
  def registerTables(spark: SparkSession): Unit = {
    LakeCatalog.register(spark, "health_tracker_classic_bronze", bronzePath)
    LakeCatalog.register(spark, "health_tracker_classic_silver", silverPath)
    LakeCatalog.register(spark, "health_tracker_user", userPath)
  }

  /** user:119-128 — CTAS the deletion list from requested user uuids. */
  def createDeletionsView(spark: SparkSession, userIds: Seq[String]): Unit = {
    import spark.implicits._
    userIds.toDF("user_id").createOrReplaceTempView("deletions")
  }

  /** etl/05:100-138 — the three MERGE deletes. */
  def deleteRequestedUsers(spark: SparkSession): Unit = {
    LakeSql.sql(spark,
      """MERGE INTO health_tracker_classic_bronze
        |USING deletions
        |ON health_tracker_classic_bronze.value RLIKE deletions.user_id
        |WHEN MATCHED THEN DELETE""".stripMargin)

    LakeSql.sql(spark,
      """CREATE OR REPLACE TEMPORARY VIEW deletion_users AS
        |  SELECT health_tracker_user.user_id, device_id FROM
        |  deletions JOIN health_tracker_user
        |  ON deletions.user_id = health_tracker_user.user_id""".stripMargin)

    LakeSql.sql(spark,
      """MERGE INTO health_tracker_classic_silver
        |USING deletion_users
        |ON deletion_users.device_id = health_tracker_classic_silver.device_id
        |WHEN MATCHED THEN DELETE""".stripMargin)

    LakeSql.sql(spark,
      """MERGE INTO health_tracker_user
        |USING deletions
        |ON deletions.user_id = health_tracker_user.user_id
        |WHEN MATCHED THEN DELETE""".stripMargin)
  }

  /** etl/05:142-183 — audit: history + counts now and as-of. */
  def silverHistory(spark: SparkSession): DataFrame =
    LakeSql.sql(spark, "DESCRIBE HISTORY health_tracker_classic_silver")

  def silverCountAsOf(spark: SparkSession, version: Long): Long =
    LakeSql.sql(spark,
      s"SELECT COUNT(*) FROM health_tracker_classic_silver VERSION AS OF $version")
      .collect()(0).getLong(0)

  def silverCount(spark: SparkSession): Long =
    LakeSql.sql(spark, "SELECT COUNT(*) FROM health_tracker_classic_silver")
      .collect()(0).getLong(0)

  /** etl/05:203-209 — selective rollback: restore one user's rows from
    * a pre-delete version (D12).
    */
  def rollbackUser(spark: SparkSession, version: Long, name: String): Unit = {
    LakeSql.sql(spark,
      s"""INSERT INTO health_tracker_classic_silver
         |SELECT * FROM health_tracker_classic_silver VERSION AS OF $version
         |WHERE name = '$name'""".stripMargin)
  }

  /** etl/05:286-354 — guarded VACUUM of all three tables. */
  def vacuumAll(spark: SparkSession, retentionHours: Double): Unit = {
    Seq("health_tracker_classic_bronze", "health_tracker_classic_silver",
      "health_tracker_user").foreach { t =>
      LakeSql.sql(spark, s"VACUUM $t RETAIN $retentionHours HOURS")
    }
  }
}
