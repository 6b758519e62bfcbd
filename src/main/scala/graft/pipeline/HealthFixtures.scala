package graft.pipeline

import java.sql.Timestamp
import java.util.UUID
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic health-tracker fixtures mirroring the reference's
  * seed data shapes (FIXTURES.md A1/A4/A5): a 10-row user dimension
  * with uuid ids (user:11-84), a landing table of hourly step events
  * with a dirty-data fraction whose device_id is the owner's uuid
  * (etl/02:367-372), and heart-rate events with negative anomalies and
  * a late-arriving slice (rapid:81, 304-306).
  */
object HealthFixtures {

  case class User(name: String, address: String, phone_number: String,
      user_id: String, device_id: Long)

  /** Stable uuid per device (UUID v3 over a fixed namespace string). */
  def uuidFor(deviceId: Long): String =
    UUID.nameUUIDFromBytes(s"graft-user-$deviceId".getBytes("UTF-8")).toString

  val userNames: Seq[String] = Seq(
    "Agnes Adams", "Bruno Brown", "Carla Cruz", "Deng Chao",
    "Elena Evans", "Farid Fahmy", "Gonzalo Valdés", "Hana Horáková",
    "Ines Ibarra", "Jonas Berg")

  def users(spark: SparkSession): DataFrame = {
    import spark.implicits._
    userNames.zipWithIndex.map { case (n, i) =>
      val d = i + 1L
      User(n, s"$d Main St\nSpringfield", f"555-01$d%02d", uuidFor(d), d)
    }.toDF().coalesce(1)
  }

  /** Landing table rows: one event per (device, simulated hour).
    * `dirtyEvery`-th event carries the owner's uuid as device_id.
    */
  def landingEvents(spark: SparkSession, hours: Int = 48,
      dirtyEvery: Int = 7): DataFrame = {
    import spark.implicits._
    val rows = for {
      h <- 0 until hours
      d <- 1L to 10L
    } yield {
      val ts = Timestamp.valueOf(f"2020-01-${h / 24 + 1}%02d ${h % 24}%02d:00:00")
      val idx = h * 10 + d.toInt
      val deviceId =
        if (idx % dirtyEvery == 0) uuidFor(d) else d.toString
      (ts, userNames((d - 1).toInt), deviceId,
        (1000 + 37 * idx % 4000), h / 24 + 1, 1, h % 24)
    }
    rows.toDF("time", "name", "device_id", "steps", "day", "month", "hour")
      .coalesce(1)
  }

  /** Heart-rate rows for the rapid-start flows: 5 devices × `days`
    * days × 24 h; every `brokenEvery`-th reading is negated (sensor
    * anomaly, rapid:81).
    */
  def heartrateEvents(spark: SparkSession, days: Int = 10,
      brokenEvery: Int = 13): DataFrame = {
    import spark.implicits._
    val rows = for {
      day <- 0 until days
      hr <- 0 until 24
      d <- 1 to 5
    } yield {
      val ts = Timestamp.valueOf(
        f"2020-02-${day + 1}%02d $hr%02d:00:00")
      val idx = (day * 24 + hr) * 5 + d
      val rate = 55.0 + (idx * 7 % 60) + (d * 3)
      val heartrate = if (idx % brokenEvery == 0) -rate else rate
      (ts.getTime / 1000.0, d.toLong, userNames(d - 1), heartrate)
    }
    rows.toDF("time", "device_id", "name", "heartrate").coalesce(1)
  }
}
