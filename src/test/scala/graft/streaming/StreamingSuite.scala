package graft.streaming

import graft.SparkSuite
import graft.lake.LakeTable
import graft.pipeline.{HealthFixtures, Ingest}
import org.apache.spark.sql.functions._

class StreamingSuite extends SparkSuite {
  import spark.implicits._

  test("streaming raw->bronze lake ingest (AvailableNow, exactly-once)") {
    val root = tmpDir("graft-stream")
    val (landing, raw, bronze) =
      (s"$root/landing", s"$root/raw", s"$root/bronze")
    val ingest = new Ingest(landing, raw)
    ingest.prepareActivityData(spark, hours = 12)
    ingest.ingestClassicData(spark, hours = 4, batchTag = "s1")

    val q = LakeStreaming.streamRawToLake(
      spark, raw, bronze, s"$root/ckpt")
    q.awaitTermination(60000)

    val t = LakeTable.forPath(spark, bronze)
    assert(t.toDF.count() === 40)
    assert(t.history().select("operation").as[String].collect()
      .contains("STREAMING UPDATE"))

    // second batch of files → restart picks up only the new data
    ingest.ingestClassicData(spark, hours = 2, batchTag = "s2")
    val q2 = LakeStreaming.streamRawToLake(
      spark, raw, bronze, s"$root/ckpt")
    q2.awaitTermination(60000)
    assert(LakeTable.forPath(spark, bronze).toDF.count() === 60)
  }

  test("watermarked windowed aggregation over an event stream") {
    val root = tmpDir("graft-stream-w")
    // drive the streaming agg with file-backed micro-batches
    val events = (0 until 120).map { i =>
      (java.sql.Timestamp.valueOf(f"2024-01-01 10:${i / 4}%02d:${(i * 17) % 60}%02d"),
        if (i % 3 == 0) "error" else "view", i * 1.0)
    }.toDF("ts", "event_type", "value")
    events.coalesce(1).write.parquet(s"$root/in")

    val stream = spark.readStream.schema(events.schema).parquet(s"$root/in")
    val agg = LakeStreaming.windowedEventCounts(stream)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_counts").start()
    q.processAllAvailable()
    val got = spark.table("win_counts")
    assert(got.count() > 0)
    val totalN = got.agg(sum("n")).as[Long].collect()(0)
    assert(totalN === 120)
    q.stop()
  }

  test("interval join: watermark bounds buffered state across batches " +
      "and drops late rows") {
    // The property that matters at 100x stream volume: symmetric join
    // state must be EVICTED as the watermark advances, not accumulate
    // forever. Four hourly commits per side, one commit per
    // micro-batch (maxFilesPerTrigger=1 on single-file commits) — by
    // the time hour k is processed the watermark sits at hour k-1's
    // max event time minus 10 min, so hours <= k-2 must have left the
    // state store. A row landing 3 hours late in the final commit
    // must be dropped, not joined.
    import graft.lake.LakeWriter
    val root = tmpDir("graft-stream-ij")
    val (vp, cp, out, ckpt) =
      (s"$root/views", s"$root/clicks", s"$root/out", s"$root/ckpt")
    def ts(hour: Int, minute: Int, sec: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-01 ${hour}%02d:$minute%02d:$sec%02d")
    val perHour = 200
    for (h <- 0 until 4) {
      val views = (0 until perHour).map(i =>
        (h * 1000L + i, ts(h, i % 10, i % 60), i.toLong % 40))
        .toDF("event_id", "ts", "user_id")
      val clicks0 = (0 until perHour).map(i =>
        (h * 1000L + 500 + i, ts(h, i % 10, (i + 30) % 60), i.toLong % 40))
      // final commit carries a 3-hours-late click: behind the
      // watermark by then, it must NOT join (its view partner from
      // hour 0 was evicted AND the row itself is late)
      val clicks = (if (h == 3) clicks0 :+ ((9999L, ts(0, 0, 45), 0L))
                    else clicks0)
        .toDF("event_id", "ts", "user_id")
      LakeWriter.write(views.coalesce(1), vp)
      LakeWriter.write(clicks.coalesce(1), cp)
    }
    val views = spark.readStream.format("lake")
      .option("maxFilesPerTrigger", "1").load(vp)
      .withWatermark("ts", "10 minutes").as("l")
    val clicks = spark.readStream.format("lake")
      .option("maxFilesPerTrigger", "1").load(cp)
      .withWatermark("ts", "10 minutes").as("r")
    val joined = views.join(clicks, expr(
      "l.user_id = r.user_id AND " +
      "r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 5 MINUTES"))
      .select(col("l.event_id").as("view_id"),
        col("r.event_id").as("click_id"))
    val q = joined.writeStream.format("lake")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(out)
    q.awaitTermination(120000)
    val progresses = q.recentProgress.filter(_.stateOperators.nonEmpty)
    assert(progresses.length >= 3,
      s"expected multiple micro-batches, got ${progresses.length}")
    val maxState = progresses.map(_.stateOperators.map(
      _.numRowsTotal).sum).max
    val totalIngested = 2L * 4 * perHour + 1
    // eviction proof: buffered rows never approach the full ingest —
    // at most ~2 hours' worth may be live at once (current hour both
    // sides + the not-yet-evicted previous hour)
    assert(maxState > 0 && maxState <= totalIngested / 2,
      s"state not bounded: max numRowsTotal $maxState of $totalIngested")
    // the late click joined nothing
    val got = LakeTable.forPath(spark, out).toDF
    assert(got.filter(col("click_id") === 9999L).count() === 0,
      "late row behind the watermark must be dropped, not joined")
    assert(got.count() > 0)
  }
}
