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
        // (checkpoint, batchId) as an idempotent txn: a restart that
        // replays a micro-batch already in the lake log skips the
        // write, closing the commit-then-crash-before-checkpoint
        // duplicate window — true exactly-once, not at-least-once.
        // The CHECKPOINT path is the identity, not the defaultable
        // queryName: two pipelines sharing the default name and one
        // bronze table must not consume each other's batch watermark
        // (whichever lagged on batchId would silently skip writes).
        LakeWriter.write(batch, bronzePath,
          partitionBy = Seq("p_ingestdate"),
          operation = "STREAMING UPDATE",
          operationParameters = Map("batchId" -> batchId.toString),
          transaction = Some((checkpoint, batchId)))
        ()
      }
      .start()
  }

  /** CDC replication — maintain `targetPath` as a row-for-row replica
    * of `sourcePath` by consuming its change data feed (the
    * `APPLY CHANGES INTO` pattern; Databricks' managed form is built
    * on exactly this loop). Each micro-batch:
    *
    *  1. collapses the batch's changes to the LATEST state per key:
    *     highest `_commit_version` wins, and within one version an
    *     `insert` (this engine's CDC emits updates as
    *     delete-preimage + insert-postimage pairs) supersedes the
    *     `delete` — so a key updated five times in one batch costs
    *     one MERGE row, not five;
    *  2. MERGEs the collapsed frame into the target: delete rows
    *     delete, everything else upserts;
    *  3. rides a `(checkpoint@queryUUID, batchId)` Txn watermark on
    *     the MERGE commit
    *     ([[graft.lake.LakeMergeBuilder.withTransaction]]), so a
    *     restart that replays a committed batch is a no-op —
    *     exactly-once, not at-least-once — while a DELETED/reset
    *     checkpoint (fresh query UUID, batchIds back at 0) gets a
    *     fresh appId and reprocesses instead of silently no-opping
    *     against the stale watermark (see [[checkpointAppId]]).
    *
    * 100 TB shape: the per-batch work is O(changes in the batch), one
    * window shuffle on the key plus the MERGE's touched-file rewrite;
    * the replica's full size is never read or shuffled. The first
    * batch on a not-yet-created target is a plain keyed write.
    *
    * Keys must be unique in the source (the usual CDC contract);
    * duplicate keys would make "latest row per key" ill-defined and
    * the MERGE's multi-match guard aborts rather than guessing.
    */
  def applyChanges(
      spark: SparkSession,
      sourcePath: String,
      targetPath: String,
      checkpoint: String,
      keyCols: Seq[String],
      queryName: String = "apply_changes",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(keyCols.nonEmpty, "applyChanges needs at least one key column")
    spark.readStream.format("lake")
      .option("readChangeFeed", "true").load(sourcePath)
      .writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyChangesBatch(batch, targetPath, keyCols,
          checkpoint, batchId)
      }
      .start()
  }

  /** The Txn appId for an applyChanges checkpoint: the checkpoint
    * PATH plus the streaming query UUID its `metadata` file records.
    * The path alone is a trap: deleting the checkpoint to reprocess
    * (a routine ops move) restarts batchIds at 0, and a target that
    * kept the old `(path -> maxBatchId)` watermark would silently
    * skip every replayed batch — the replica stops converging with
    * no error. A fresh checkpoint mints a fresh UUID, so the replay
    * applies under a new appId and the latest-per-key MERGEs converge
    * the replica again. Falls back to the bare path when no metadata
    * file exists (direct applyChangesBatch callers).
    */
  private def checkpointAppId(
      spark: SparkSession, checkpointId: String): String = {
    try {
      val p = new org.apache.hadoop.fs.Path(checkpointId, "metadata")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) checkpointId
      else {
        val in = fs.open(p)
        val text = try new String(in.readAllBytes(), "UTF-8")
        finally in.close()
        """"id"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(text)
          .map(m => s"$checkpointId@${m.group(1)}")
          .getOrElse(checkpointId)
      }
    } catch { case _: java.io.IOException => checkpointId }
  }

  /** One micro-batch of [[applyChanges]] — separated for direct use
    * from a caller's own foreachBatch and for testability.
    */
  def applyChangesBatch(
      batch: DataFrame,
      targetPath: String,
      keyCols: Seq[String],
      checkpointId: String,
      batchId: Long): Unit = {
    import graft.lake.{Cdf, LakeLog, LakeTable}
    val spark = batch.sparkSession
    val audit = Set(Cdf.CHANGE_TYPE, Cdf.COMMIT_VERSION,
      Cdf.COMMIT_TIMESTAMP)
    val dataCols = batch.columns.filterNot(audit.contains).toSeq
    require(keyCols.forall(dataCols.contains),
      s"key columns ${keyCols.mkString(",")} must be source columns")
    // latest change per key: per-version the insert postimage
    // supersedes the delete preimage (update = delete + insert)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(Cdf.COMMIT_VERSION).desc,
        (col(Cdf.CHANGE_TYPE) === "insert").desc)
    val latest = batch
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select((dataCols :+ Cdf.CHANGE_TYPE).map(col): _*)
    val appId = checkpointAppId(spark, checkpointId)
    if (!new LakeLog(targetPath).exists) {
      // first batch: nothing to match — the inserts ARE the table
      graft.lake.LakeWriter.write(
        latest.filter(col(Cdf.CHANGE_TYPE) =!= "delete")
          .select(dataCols.map(col): _*),
        targetPath,
        operation = "APPLY CHANGES",
        operationParameters = Map("batchId" -> batchId.toString),
        transaction = Some((appId, batchId)))
      ()
    } else {
      val cond = keyCols.map(k => s"t.$k = s.$k").mkString(" AND ")
      LakeTable.forPath(spark, targetPath).as("t")
        .merge(latest.as("s"), cond)
        .whenMatchedDelete(s"s.${Cdf.CHANGE_TYPE} = 'delete'")
        .whenMatchedUpdate(
          dataCols.map(c => c -> s"s.$c").toMap)
        .whenNotMatchedInsert(s"s.${Cdf.CHANGE_TYPE} <> 'delete'",
          dataCols.map(c => c -> s"s.$c").toMap)
        .withTransaction(appId, batchId)
        .execute()
    }
  }

  /** Watermarked tumbling-window counts per event type over a stream
    * with an event-time column.
    */
  def windowedEventCounts(
      events: DataFrame,
      tsCol: String = "ts",
      typeCol: String = "event_type",
      windowLen: String = "5 minutes",
      watermark: String = "10 minutes",
      valueCol: String = "value"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(typeCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total_value"))

  /** Declarative session aggregation via the built-in
    * `session_window`: events within `gapMinutes` of the session's
    * last event merge, the window closes after a gap. The native
    * streaming form of sessionization — watermark-driven state
    * eviction, merge-on-update session state in the state store,
    * whole-stage-codegen'd agg — and the one to prefer at 100 TB when
    * per-session custom logic isn't needed: unlike
    * [[sessionizeStream]]'s `flatMapGroupsWithState` (arbitrary Scala
    * state, but opaque to the optimizer) this stays a declarative
    * aggregate Catalyst can partial-aggregate and AQE can re-plan.
    * Session end is `last event + gap` (Spark's session_window
    * contract; the batch gaps-and-islands form reports the last
    * event itself).
    */
  def sessionWindowCounts(
      events: DataFrame,
      gapMinutes: Int = 30,
      tsCol: String = "ts",
      keyCol: String = "user_id",
      valueCol: String = "value",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol),
        session_window(col(tsCol), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("total_value"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))

  /** Inactivity-gap sessionization over (user_id, ts, value) rows —
    * the gaps-and-islands window plan: mark session starts with lag(),
    * number sessions with a running sum, aggregate per (user, sid).
    *
    * This is the 100 TB-safe batch form: ONE shuffle on user_id, the
    * per-user ordering comes from Spark's spillable sort, and both
    * window functions stream over the sorted iterator with O(1) frame
    * state — no per-user materialization, so a hot key (one bot
    * account with 10⁸ events) spills instead of OOMing the task. The
    * typed `flatMapGroups` equivalent is kept as [[sessionizeTyped]];
    * for the streaming form see [[sessionizeStream]].
    */
  def sessionize(
      events: DataFrame, gapMinutes: Int,
      userCol: String = "user_id", tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapMicros = gapMinutes * 60000000L
    val byUser = Window.partitionBy("user_id").orderBy("tsu")
    events
      .select(col(userCol).cast("long").as("user_id"),
        unix_micros(col(tsCol).cast("timestamp")).as("tsu"),
        col(valueCol).cast("double").as("value"))
      .withColumn("new_sess",
        when(col("tsu") - lag("tsu", 1).over(byUser) <= gapMicros, lit(0L))
          .otherwise(lit(1L)))
      .withColumn("sid", sum("new_sess").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(
        timestamp_micros(min("tsu")).as("session_start"),
        timestamp_micros(max("tsu")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum("value").as("total_value"))
      .select("user_id", "session_start", "session_end",
        "n_events", "total_value")
  }

  /** [[sessionize]] via the typed `KeyValueGroupedDataset` API
    * (SURVEY §2.10's custom-state surface) — the API demo. Each user's
    * events are materialized on the executor that owns the key, so
    * state is bounded by the largest single user; prefer [[sessionize]]
    * for backfills where a hot key may not fit.
    */
  def sessionizeTyped(
      events: DataFrame, gapMinutes: Int,
      userCol: String = "user_id", tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMicros = gapMinutes * 60000000L
    events
      .select(col(userCol).cast("long").as("user_id"),
        unix_micros(col(tsCol).cast("timestamp")).as("tsu"),
        col(valueCol).cast("double").as("value"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (uid, it) =>
        sessionsOf(uid, it.toSeq.map(e => (e._2, e._3)), gapMicros)
      }
      .toDF("user_id", "session_start", "session_end",
        "n_events", "total_value")
      .withColumn("session_start", timestamp_micros(col("session_start")))
      .withColumn("session_end", timestamp_micros(col("session_end")))
  }

  /** Streaming sessionization: `flatMapGroupsWithState` with an
    * event-time timeout — a user's open session lives in the state
    * store and is emitted once the watermark passes its close. Append
    * output; sessions still open at the end of input stay in state
    * (exactly the semantics a continuous pipeline wants; a batch
    * backfill should use [[sessionize]]).
    */
  def sessionizeStream(
      events: DataFrame, gapMinutes: Int,
      watermark: String = "10 minutes"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
      OutputMode}
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("ts"),
        col("value").cast("double"))
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[(Long, Double)],
        (Long, Long, Long, Long, Double)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, it, state: GroupState[List[(Long, Double)]]) =>
          val incoming = it.map(e => (e._2.getTime, e._3)).toList
          if (state.hasTimedOut) {
            val events = state.get
            state.remove()
            sessionsOf(uid, events, gapMs).iterator
          } else {
            val all = (state.getOption.getOrElse(Nil) ++ incoming)
              .sortBy(_._1)
            // emit closed sessions, keep the open tail in state
            val sessions = sessionsOf(uid, all, gapMs)
            val wm = state.getCurrentWatermarkMs()
            val (closed, open) = sessions.partition(_._3 + gapMs <= wm)
            val keep = all.filter(e =>
              open.exists(s => e._1 >= s._2 && e._1 <= s._3))
            if (keep.nonEmpty) {
              state.update(keep)
              state.setTimeoutTimestamp(keep.map(_._1).max + gapMs)
            } else state.remove()
            closed.iterator
          }
      }
      .toDF("user_id", "session_start", "session_end",
        "n_events", "total_value")
      .withColumn("session_start", timestamp_millis(col("session_start")))
      .withColumn("session_end", timestamp_millis(col("session_end")))
  }

  /** Split one user's (epochMs, value) events into gap-delimited
    * sessions → (uid, startMs, endMs, n, total).
    */
  private def sessionsOf(
      uid: Long, events: Seq[(Long, Double)],
      gapMs: Long): Seq[(Long, Long, Long, Long, Double)] = {
    if (events.isEmpty) return Nil
    val sorted = events.sortBy(_._1)
    val out = Seq.newBuilder[(Long, Long, Long, Long, Double)]
    var start = sorted.head._1
    var last = sorted.head._1
    var n = 0L
    var total = 0.0
    sorted.foreach { case (ts, v) =>
      if (ts - last > gapMs) {
        out += ((uid, start, last, n, total))
        start = ts; n = 0L; total = 0.0
      }
      last = ts; n += 1; total += v
    }
    out += ((uid, start, last, n, total))
    out.result()
  }

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
