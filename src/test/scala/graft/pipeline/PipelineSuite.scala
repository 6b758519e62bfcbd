package graft.pipeline

import graft.SparkSuite
import graft.lake.{LakeTable, LakeCatalog, LakeSql}
import org.apache.spark.sql.functions._

/** End-to-end medallion pipeline + compliance flows, asserting the
  * reference's own invariants (SURVEY §5): 10 rows/simulated hour,
  * bronze status state machine, quarantine repair leaves no pending
  * rows, GDPR delete + selective rollback + vacuum.
  */
class PipelineSuite extends SparkSuite {
  import spark.implicits._

  private def paths() = {
    val root = tmpDir("graft-pipe")
    (s"$root/landing", s"$root/raw", s"$root/bronze", s"$root/silver",
      s"$root/user")
  }

  test("16 simulated hours -> 160 bronze rows (etl/02:174-176)") {
    val (landing, raw, bronze, silver, user) = paths()
    val ingest = new Ingest(landing, raw)
    ingest.prepareActivityData(spark, hours = 48)
    val pipe = new Pipeline(raw, bronze, silver, user,
      new Operations(Operations.fixedClock("2020-03-01 00:00:00")))
    pipe.writeUserDimension(spark)

    // 16 hours in two micro-batches, like the walkthrough
    ingest.ingestClassicData(spark, hours = 8, batchTag = "b1")
    ingest.ingestClassicData(spark, hours = 8, batchTag = "b2")
    pipe.runBatch(spark)

    val bronzeDF = LakeTable.forPath(spark, bronze).toDF
    assert(bronzeDF.count() === 160)
    // landing drained by exactly 160 rows
    assert(LakeTable.forPath(spark, landing).toDF.count() === 480 - 160)
    // schema matches the asserted bronze shape (etl/02:128-136)
    assert(bronzeDF.schema.fieldNames.sorted ===
      Array("datasource", "ingesttime", "p_ingestdate", "status", "value"))
  }

  test("status state machine: all rows loaded after repair (etl/03:233-240)") {
    val (landing, raw, bronze, silver, user) = paths()
    val ingest = new Ingest(landing, raw)
    ingest.prepareActivityData(spark, hours = 24)
    val pipe = new Pipeline(raw, bronze, silver, user,
      new Operations(Operations.fixedClock("2020-03-01 00:00:00")))
    pipe.writeUserDimension(spark)
    ingest.ingestClassicData(spark, hours = 10, batchTag = "b1")
    pipe.runBatch(spark)

    val statuses = LakeTable.forPath(spark, bronze).toDF
      .groupBy("status").count().as[(String, Long)].collect().toMap
    // dirty rows were quarantined then repaired -> everything loaded
    assert(statuses.keySet === Set("loaded"))
    assert(statuses("loaded") === 100)

    val silverDF = LakeTable.forPath(spark, silver).toDF
    assert(silverDF.count() === 100)
    // repaired rows got integer device ids via the user-dim join
    assert(silverDF.filter($"device_id".isNull).count() === 0)
    assert(silverDF.schema.fieldNames.sorted ===
      Array("device_id", "eventtime", "name", "p_eventdate", "steps"))
  }

  test("compliance: GDPR delete, time-travel audit, rollback, vacuum (etl/05)") {
    val (landing, raw, bronze, silver, user) = paths()
    val ingest = new Ingest(landing, raw)
    ingest.prepareActivityData(spark, hours = 24)
    val pipe = new Pipeline(raw, bronze, silver, user,
      new Operations(Operations.fixedClock("2020-03-01 00:00:00")))
    pipe.writeUserDimension(spark)
    ingest.ingestClassicData(spark, hours = 10, batchTag = "b1")
    pipe.runBatch(spark)

    val comp = new Compliance(bronze, silver, user)
    comp.registerTables(spark)
    val doomedUsers = Seq(HealthFixtures.uuidFor(3), HealthFixtures.uuidFor(7))
    val doomedNames = Seq(HealthFixtures.userNames(2), HealthFixtures.userNames(6))
    comp.createDeletionsView(spark, doomedUsers)

    val preDeleteVersion = LakeTable.forPath(spark, silver).snapshot().version
    val preCount = comp.silverCount(spark)
    comp.deleteRequestedUsers(spark)

    // silver: devices 3 and 7 gone
    val silverDF = LakeTable.forPath(spark, silver).toDF
    assert(silverDF.filter($"device_id".isin(3, 7)).count() === 0)
    assert(comp.silverCount(spark) === preCount - 20)
    // bronze: the RLIKE merge removes every raw value carrying a doomed
    // uuid (reference semantics — clean rows never embed the uuid)
    val bronzeDF = LakeTable.forPath(spark, bronze).toDF
    doomedUsers.foreach { u =>
      assert(bronzeDF.filter($"value".contains(u)).count() === 0)
    }
    // user dim: rows removed
    assert(LakeTable.forPath(spark, user).toDF
      .filter($"user_id".isin(doomedUsers: _*)).count() === 0)

    // time travel still sees the pre-delete state
    assert(comp.silverCountAsOf(spark, preDeleteVersion) === preCount)

    // selective rollback of one user (etl/05:203-209)
    comp.rollbackUser(spark, preDeleteVersion, doomedNames.head)
    assert(comp.silverCount(spark) === preCount - 10)

    // history audit shows the flow
    val ops = comp.silverHistory(spark)
      .select("operation").as[String].collect().toSeq
    assert(ops.take(2) === Seq("INSERT", "MERGE"))

    // guarded vacuum
    intercept[IllegalArgumentException](comp.vacuumAll(spark, 0))
    spark.conf.set(LakeTable.RETENTION_CHECK_KEY, "false")
    try {
      comp.vacuumAll(spark, 0)
      // current state unaffected by vacuum
      assert(comp.silverCount(spark) === preCount - 10)
      // the vacuumed pre-delete version is no longer reachable
      intercept[IllegalStateException](
        LakeTable.forPath(spark, silver).asOf(preDeleteVersion).count())
    } finally spark.conf.set(LakeTable.RETENTION_CHECK_KEY, "true")
  }

  test("SQL CTAS into lake + CONVERT TO LAKE (K5/K7)") {
    val root = tmpDir("graft-ctas")
    // CTAS: materialize a filtered lake table from a temp view
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
      .createOrReplaceTempView("ctas_src")
    LakeSql.sql(spark,
      s"CREATE TABLE ctas_t USING lake LOCATION '$root/ctas_t' AS " +
        "SELECT * FROM ctas_src WHERE id >= 2")
    assert(LakeSql.sql(spark, "SELECT count(*) AS n FROM ctas_t")
      .collect()(0).getLong(0) === 2)
    // CONVERT: plain parquet dir becomes a lake table in place
    Seq((10L, "x"), (11L, "y")).toDF("id", "s").coalesce(1)
      .write.parquet(s"$root/plain")
    LakeSql.sql(spark, s"CONVERT TO LAKE parquet.`$root/plain`")
    assert(LakeTable.forPath(spark, s"$root/plain").toDF.count() === 2)
    // RESTORE via SQL: rewind ctas_t after a delete
    LakeSql.sql(spark, "DELETE FROM ctas_t WHERE id = 3")
    assert(LakeSql.sql(spark, "SELECT count(*) AS n FROM ctas_t")
      .collect()(0).getLong(0) === 1)
    LakeSql.sql(spark, "RESTORE TABLE ctas_t TO VERSION AS OF 0")
    assert(LakeSql.sql(spark, "SELECT count(*) AS n FROM ctas_t")
      .collect()(0).getLong(0) === 2)
  }

  test("SQL MERGE upsert through LakeSql (rapid:398-420 shape)") {
    val root = tmpDir("graft-sql")
    val path = s"$root/hr"
    graft.lake.LakeWriter.write(
      Seq((1L, 60.0), (2L, -5.0), (3L, 70.0)).toDF("id", "rate").coalesce(1),
      path)
    LakeCatalog.register(spark, "hr", path)
    Seq((2L, 65.0), (9L, 80.0)).toDF("id", "rate")
      .createOrReplaceTempView("updates")
    LakeSql.sql(spark,
      """MERGE INTO hr USING updates ON hr.id = updates.id
        |WHEN MATCHED THEN UPDATE SET rate = updates.rate
        |WHEN NOT MATCHED THEN INSERT (id, rate) VALUES (updates.id, updates.rate)
      """.stripMargin)
    val got = LakeSql.sql(spark, "SELECT * FROM hr ORDER BY id")
      .as[(Long, Double)].collect()
    assert(got === Array((1L, 60.0), (2L, 65.0), (3L, 70.0), (9L, 80.0)))
  }
}
