package graft.pipeline

import graft.SparkSuite
import graft.lake.{LakeTable, LakeWriter}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The rapid-start walkthrough shapes (SURVEY §3.3): gold aggregate,
  * lag/lead interpolation of broken readings upserted via MERGE, and
  * schema evolution with device_type — over the lake format.
  */
class RapidSuite extends SparkSuite {
  import spark.implicits._

  private def processed(days: Int) = {
    val raw = HealthFixtures.heartrateEvents(spark, days)
    raw.select(
      to_date(timestamp_seconds(col("time"))).as("dte"),
      timestamp_seconds(col("time")).as("time"),
      col("heartrate"), col("name"),
      col("device_id").cast("integer").as("p_device_id"))
  }

  test("gold per-device analytics (rapid:185-198)") {
    val path = tablePath("rapid-gold")
    LakeWriter.write(processed(5), path, partitionBy = Seq("p_device_id"))
    val gold = LakeTable.forPath(spark, path).toDF
      .groupBy("p_device_id")
      .agg(avg("heartrate").as("avg_heartrate"),
        max("heartrate").as("max_heartrate"),
        stddev("heartrate").as("stddev_heartrate"))
    assert(gold.count() === 5)
    assert(gold.filter($"max_heartrate" <= 0).count() === 0)
  }

  test("broken readings interpolated via lag/lead + MERGE upsert (rapid:325-420)") {
    val path = tablePath("rapid-interp")
    LakeWriter.write(processed(5), path, partitionBy = Seq("p_device_id"))
    val t = LakeTable.forPath(spark, path)
    val brokenBefore = t.toDF.filter($"heartrate" < 0).count()
    assert(brokenBefore > 0)

    val w = Window.partitionBy("p_device_id").orderBy("time")
    val updates = t.toDF
      .select(col("*"),
        lag($"heartrate", 1).over(w).as("prev_amt"),
        lead($"heartrate", 1).over(w).as("next_amt"))
      .filter($"heartrate" < 0)
      .select($"dte", $"time",
        (($"prev_amt" + $"next_amt") / 2).as("heartrate"),
        $"name", $"p_device_id")

    t.as("health")
      .merge(updates.as("updates"),
        "health.time = updates.time AND health.p_device_id = updates.p_device_id")
      .whenMatchedUpdate(Map("heartrate" -> "updates.heartrate"))
      .execute()

    val after = LakeTable.forPath(spark, path).toDF
    assert(after.filter($"heartrate" < 0).count() === 0)
    assert(after.count() === t.toDF.count())
  }

  test("schema evolution adds device_type; old rows read NULL (rapid:529-575)") {
    val path = tablePath("rapid-evolve")
    LakeWriter.write(processed(3), path, partitionBy = Seq("p_device_id"))
    val v2 = processed(2).withColumn("device_type", lit("version 2"))
    intercept[graft.lake.SchemaMismatchException](
      LakeWriter.write(v2, path))
    LakeWriter.write(v2, path, mergeSchema = true)
    val df = LakeTable.forPath(spark, path).toDF
    assert(df.filter($"device_type".isNull).count() === 3 * 24 * 5)
    assert(df.filter($"device_type" === "version 2").count() === 2 * 24 * 5)
  }
}
