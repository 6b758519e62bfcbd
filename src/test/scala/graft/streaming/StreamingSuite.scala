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
}
