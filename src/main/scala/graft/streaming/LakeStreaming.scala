package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.lake.LakeWriter

/** Structured Streaming surface (SURVEY §2.10): the reference
  * simulates its Kafka feed with batch micro-batches (util:45-75) and
  * ships an `untilStreamIsReady` poller (util:78-84) for the "plus"
  * streaming pipeline it alludes to (etl/01:217-223). Here both are
  * first-class:
  *
  *  - [[streamRawToLake]]: readStream over the raw JSON-lines landing
  *    dir → bronze-shaped rows → foreachBatch append into a lake table
  *    (each micro-batch = one atomic lake commit, giving exactly-once
  *    on top of the checkpointed source);
  *  - [[windowedEventCounts]]: watermarked tumbling-window aggregation;
  *  - [[untilStreamIsReady]]: the reference's readiness poller.
  */
object LakeStreaming {

  /** Stream raw JSON-lines files into a lake table. Returns the query;
    * callers stop it (or `processAllAvailable` in tests).
    */
  def streamRawToLake(
      spark: SparkSession,
      rawPath: String,
      bronzePath: String,
      checkpoint: String,
      queryName: String = "raw_to_bronze"): StreamingQuery = {
    val raw = spark.readStream
      .format("text").schema("value STRING").load(rawPath)
    val bronze = raw.select(
      lit("files.training.databricks.com").as("datasource"),
      current_timestamp().as("ingesttime"),
      lit("new").as("status"),
      col("value"),
      current_timestamp().cast("date").as("p_ingestdate"))
    bronze.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // (queryName, batchId) as an idempotent txn: a restart that
        // replays a micro-batch already in the lake log skips the
        // write, closing the commit-then-crash-before-checkpoint
        // duplicate window — true exactly-once, not at-least-once.
        LakeWriter.write(batch, bronzePath,
          partitionBy = Seq("p_ingestdate"),
          operation = "STREAMING UPDATE",
          operationParameters = Map("batchId" -> batchId.toString),
          transaction = Some((queryName, batchId)))
        ()
      }
      .start()
  }

  /** Watermarked tumbling-window counts per event type over a stream
    * with an event-time column.
    */
  def windowedEventCounts(
      events: DataFrame,
      tsCol: String = "ts",
      typeCol: String = "event_type",
      windowLen: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(typeCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** util:78-84 — poll until the named stream has made progress. */
  def untilStreamIsReady(
      spark: SparkSession, name: String, progressions: Int = 3,
      timeoutMs: Long = 60000): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline) {
      val q = spark.streams.active.find(_.name == name)
      if (q.exists(_.recentProgress.length >= progressions)) return true
      Thread.sleep(200)
    }
    false
  }
}
